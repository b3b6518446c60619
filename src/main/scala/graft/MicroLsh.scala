package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the l2b MinHash+LSH pipeline — attributes wall
  * time to exact-dup contraction, shingling, signature computation, band
  * join, and verification (the MicroDedup pattern for the LSH path).
  *
  * Usage: `sbt "runMain graft.MicroLsh [sfDir]"` (or tools/run.sh).
  */
object MicroLsh {
  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[micro-lsh] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
    val h = docs.select(col("doc_id"), col("text"), sha2(col("text"), 256).as("ch"))
    val clusters = h.groupBy(col("ch"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("csize"))
    val reps = h.join(clusters.select(col("rep_id")), col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"))
    var nReps = 0L
    time("reps.count") { nReps = reps.count(); println(s"  reps=$nReps") }

    val sh = DedupOps.shingles(reps, 3).persist()
    time("shingles")(println(s"  shingles=${sh.count()}"))

    val sigs = DedupOps.minhashSignatures(sh, 64).persist()
    time("signatures")(println(s"  sig_rows=${sigs.count()}"))

    // Pass the exact banded-row count (|reps|·bands — already counted
    // above) so the broadcast decision is arithmetic, matching the gated
    // pipeline's plan rather than the unknown-count estimate path.
    val cand = DedupOps.lshCandidates(sigs, rowsPerBand = 4,
                                      nBandRows = nReps * (64 / 4)).persist()
    time("candidates r=4")(println(s"  candidates=${cand.count()}"))

    time("verify")(sink(
      DedupOps.verifyJaccard(sh, allCandidates = false, candidates = cand,
                             threshold = 0.8)))

    cand.unpersist(); sigs.unpersist(); sh.unpersist()

    // End-to-end, cold (the gated query's exact shape). Pass a second arg
    // to ALSO dump the executed plan with per-node metrics (the view that
    // located the single-task AQE-coalesce pathology).
    val e2e = DedupOps.clusteredMinhashPairs(docs, 0.8).orderBy("da", "db")
    if (args.length > 1) time("e2e + metrics")(PlanAudit.dumpMetrics(e2e))
    else time("clusteredMinhashPairs e2e")(sink(e2e))

    spark.stop()
  }
}
