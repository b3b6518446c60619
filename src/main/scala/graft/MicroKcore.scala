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
    * distributed degree aggregate per round. Since round 15 this IS the
    * operator's own wide-fingerprint route ([[DedupOps.docKCore]] — the
    * r14 ADVICE driver-OOM guard), so the probe times the shipped code,
    * not a probe-only reimplementation.
    */
  private def docLevelKCore(docs: DataFrame): DataFrame =
    DedupOps.docKCore(docs, maxHamming = 1, bits = 16)

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
