package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the l2 near-dup pipeline (the bench's most
  * expensive query) — attributes wall time to shingling, prefix build,
  * candidate generation, and verification so optimization hits the real
  * bottleneck instead of the guessed one.
  *
  * Usage: `sbt "runMain graft.MicroDedup [sfDir]"` (or tools/run.sh).
  */
object MicroDedup {
  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[micro-dedup] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs.count")(println(s"  docs=${docs.count()}"))

    // Exact-dup collapse (the clustered wrapper's first step)
    val h = docs.select(col("doc_id"), col("text"), sha2(col("text"), 256).as("ch"))
    val clusters = h.groupBy(col("ch"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("csize"))
    val reps = h.join(clusters.select(col("rep_id")), col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"))
    time("reps.count")(println(s"  reps=${reps.count()}"))

    val sh = DedupOps.shingles(reps, 3).persist()
    time("shingles")(println(s"  shingles=${sh.count()}"))

    val freq = sh.groupBy(col("code")).agg(count(lit(1)).as("cf"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("cf").asc, col("code").asc)
    val ranked = sh.join(freq, "code")
      .withColumn("r", row_number().over(byRarity))
      .withColumn("nsh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val T = (0.8 * 1e6).toLong; val M = 1000000L
    val ceilTn = ((lit(T) * col("nsh") + lit(M - 1)) / lit(M)).cast("long")
    val prefix = ranked.filter(col("r") <= col("nsh") - ceilTn + 1).persist()
    time("prefix build")(println(s"  prefix_rows=${prefix.count()}"))

    val a = prefix.select(col("doc_id").as("da"), col("r").as("ra"),
                          col("nsh").as("na"), col("code"))
    val b = prefix.select(col("doc_id").as("db"), col("r").as("rb"),
                          col("nsh").as("nb"), col("code"))
    val cap = lit(1L) + least(col("na") - col("ra"), col("nb") - col("rb"))
    val cand = a.join(b, "code")
      .filter(col("da") < col("db"))
      .filter(col("nb") * M >= col("na") * T && col("na") * M >= col("nb") * T)
      .filter(cap * (M + T) >= (col("na") + col("nb")) * T)
      .select("da", "db").distinct().persist()
    time("candidates")(println(s"  candidates=${cand.count()}"))

    time("verify")(sink(
      DedupOps.verifyJaccard(sh, allCandidates = false, candidates = cand,
                             threshold = 0.8)))

    // Variant: broadcast the per-doc sorted code sets into both
    // candidate-attach joins (the sets frame is |docs| rows — tiny next to
    // |candidates|) instead of shuffling the candidate pairs twice.
    val nParts = spark.sparkContext.defaultParallelism
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val sets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("code"))).as("codes"))
      .persist()
    sets.count()
    time("verify-broadcast-sets")(sink {
      val inter = cand.repartition(nParts, col("da"))
        .join(broadcast(sets.select(col("doc_id").as("da"), col("codes").as("ca"))), "da")
        .join(broadcast(sets.select(col("doc_id").as("db"), col("codes").as("cb"))), "db")
        .select(col("da"), col("db"),
          graft.functions.SortedIntersectCount(col("ca"), col("cb")).as("c"))
        .filter(col("c") > 0)
      inter
        .join(broadcast(sizes.select(col("doc_id").as("da"), col("nsh").as("na"))), "da")
        .join(broadcast(sizes.select(col("doc_id").as("db"), col("nsh").as("nb"))), "db")
        .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= 0.8)
        .select(col("da"), col("db"),
          graft.Q.round4Ratio(col("c"), col("na") + col("nb") - col("c")).as("jaccard"))
    })
    sets.unpersist()

    // Variant: k=2 generalized prefix filter — a candidate pair must share
    // TWO codes within prefixes extended by one (r ≤ n − ⌈t·n⌉ + 2), and
    // the join key is the ordered code PAIR. Validity: if |A∩B| ≥ α, the
    // m-th globally-rarest common element has ≥ α−m common elements after
    // it, so it sits within position n − α + m on both sides — the two
    // rarest common codes land in both extended prefixes. Pair keys square
    // the key space, collapsing the df² blowup of hot single codes.
    //
    // MEASURED NEGATIVE (sf0.1, 2026-08-13): candidates 3.42M → 2.24M
    // (−35%) but generation 1.9 s → 3.2 s (the C(p,2) per-doc pair
    // explosion outweighs the rarer keys) — on this corpus the ~30-word
    // vocabulary makes even rare-code PAIRS common. Kept as the recorded
    // experiment so the next round doesn't re-derive it; the production
    // path stays k=1 prefix + PPJoin bounds.
    val prefix2 = ranked.filter(col("r") <= col("nsh") - ceilTn + 2)
      .select(col("doc_id"), col("code"), col("r"), col("nsh")).persist()
    prefix2.count()
    val pa = prefix2.select(col("doc_id").as("dd"), col("code").as("c1"),
                            col("r").as("r1"))
    val pb = prefix2.select(col("doc_id").as("dd"), col("code").as("c2"),
                            col("r").as("r2"), col("nsh"))
    val docPairs = pa.join(pb, Seq("dd")).filter(col("r1") < col("r2"))
      .select(col("dd"), col("c1"), col("c2"), col("r2"), col("nsh"))
    val qa = docPairs.select(col("dd").as("da"), col("c1"), col("c2"),
                             col("r2").as("ra"), col("nsh").as("na"))
    val qb = docPairs.select(col("dd").as("db"), col("c1"), col("c2"),
                             col("r2").as("rb"), col("nsh").as("nb"))
    val cap2 = lit(2L) + least(col("na") - col("ra"), col("nb") - col("rb"))
    val cand2 = qa.join(qb, Seq("c1", "c2"))
      .filter(col("da") < col("db"))
      .filter(col("nb") * M >= col("na") * T && col("na") * M >= col("nb") * T)
      .filter(cap2 * (M + T) >= (col("na") + col("nb")) * T)
      .select("da", "db").distinct().persist()
    time("candidates k=2")(println(s"  candidates2=${cand2.count()}"))
    time("verify k=2")(sink(
      DedupOps.verifyJaccard(sh, allCandidates = false, candidates = cand2,
                             threshold = 0.8)))
    cand2.unpersist(); prefix2.unpersist()

    time("l2 full (gated path)")(sink(
      DedupOps.clusteredJaccardPairs(docs, 0.8)))

    cand.unpersist(); prefix.unpersist(); sh.unpersist()
    spark.stop()
  }
}
