package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe for the l60 k-core peel: times the fingerprint-class
  * quotient construction ([[DedupOps.simhashKCore]] — bounded class table
  * peeled in a driver loop) against a naive DOC-LEVEL distributed peel
  * (each round one degree aggregate + one anti filter over the full
  * near-dup graph, localCheckpoint-pinned between rounds), and asserts
  * the two agree row-for-row before reporting.
  *
  * The quotient's claim is structural — same-fingerprint docs share
  * degree at every round, so the peel collapses onto ≤ 2^bits weighted
  * class nodes — and the doc-level variant is what an engine without the
  * contraction would run: rounds × (join + aggregate) over an edge frame
  * that scales with corpus duplication (sf0.1: ~1.16M directed edges vs
  * ~3k class-adjacency rows).
  *
  * Usage: `sbt "runMain graft.MicroKcore [sfDir] [passes]"`.
  */
object MicroKcore {

  private var passes = 3

  private def time(f: => Unit): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The contraction-free peel: doc-level edges from the same banded pair
    * engine, then round-synchronous degree-threshold removal with one
    * distributed degree aggregate per round. k is derived exactly as the
    * operator does (lower median of doc degrees) from a degree HISTOGRAM
    * (distinct-degree-sized — the only driver traffic besides the
    * convergence counts).
    */
  private def docLevelKCore(docs: DataFrame): DataFrame = {
    val pr = DedupOps.simhashPairs(docs, maxHamming = 1).select("da", "db")
    val e = pr.select(col("da").as("s"), col("db").as("t"))
      .unionByName(pr.select(col("db").as("s"), col("da").as("t")))
      .localCheckpoint(true)
    val nodes = DedupOps.simhash(docs).select("doc_id").localCheckpoint(true)
    val deg0 = nodes.join(e, nodes("doc_id") === e("s"), "left")
      .groupBy(col("doc_id")).agg(count(col("t")).as("deg0"))
      .localCheckpoint(true)
    val hist = deg0.groupBy(col("deg0").as("d")).agg(count(lit(1)).as("c"))
      .orderBy("d").collect()
    val n = hist.map(_.getLong(1)).sum
    var cum = 0L
    val k = hist.collectFirst {
      case r if { cum += r.getLong(1); 2 * cum >= n } => r.getLong(0)
    }.getOrElse(0L)
    var surv = deg0.select(col("doc_id")).localCheckpoint(true)
    var peeled = surv.select(col("doc_id"), lit(0L).as("peel_round"))
      .limit(0).localCheckpoint(true)
    var round = 0L
    var done = false
    while (!done) {
      round += 1
      val d = surv.join(
          e.join(surv.select(col("doc_id").as("t")), Seq("t")),
          surv("doc_id") === col("s"), "left")
        .groupBy(surv("doc_id")).agg(count(col("t")).as("deg"))
      val rm = d.filter(col("deg") < k).select(col("doc_id"))
        .localCheckpoint(true)
      if (rm.count() == 0L) done = true
      else {
        peeled = peeled.unionByName(
            rm.select(col("doc_id"), lit(round).as("peel_round")))
          .localCheckpoint(true)
        surv = surv.join(rm, Seq("doc_id"), "left_anti").localCheckpoint(true)
      }
    }
    deg0.join(peeled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg0"), lit(k).as("k"),
              coalesce(col("peel_round"), lit(0L)).as("peel_round"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    passes = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // Equality first (single pass each), then timings.
    def canon(df: DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("deg0"), r.getAs[Long]("k"),
          r.getAs[Long]("peel_round")))).toMap
    val q = canon(DedupOps.simhashKCore(docs))
    val d = canon(docLevelKCore(docs))
    require(q == d, s"quotient != doc-level peel (${q.size} vs ${d.size} rows)")

    val tq = time(sink(DedupOps.simhashKCore(docs)))
    val td = time(sink(docLevelKCore(docs)))
    println(f"[micro-kcore] $sfDir docs=${docs.count()} " +
      f"quotient=$tq%.2f s doc-level=$td%.2f s (min of $passes)")
    spark.stop()
  }
}
