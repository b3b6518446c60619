package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe for the l5f/l5g recall-vs-scale question (r14 verdict
  * item 2): measures recall@5 of the fixed-256 IVF-PQ index at the FIXED
  * production widths (nprobe 16, shortlist 80 — l5f's gate) against the
  * SCALE-AWARE widths ([[SimilarityOps.scaledNprobe]] /
  * [[SimilarityOps.scaledShortlistFactor]] — l5g's rule) on the real
  * embeddings tables AND a synthetic rung an order of magnitude past
  * sf0.1, where fixed widths are extrapolated to cross the 0.5 floor.
  *
  * The synthetic corpus is CLUSTERED (the regime ANN indexes exist for —
  * uniform random embeddings have no recoverable neighbor structure):
  * 500 cluster centers from a seed-free integer hash, each vector its
  * cluster's center plus 15% hash noise, so nearest neighbors are
  * overwhelmingly same-cluster and recall measures whether the probe
  * list finds the right cells.
  *
  * Usage: `sbt "runMain graft.MicroAnn [sfDir|synth:N ...]"`.
  */
object MicroAnn {

  private def synth(spark: org.apache.spark.sql.SparkSession,
                    n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), i -> cast(
                cast(hash(id % 500, i) as double) / 2147483647.0d
              + 0.15d * (cast(hash(id, i, 7) as double) / 2147483647.0d)
              as float))""").as("embedding"))

  private def recallAt(corpus: DataFrame, np: Int, slf: Int): Double = {
    val q = corpus.filter(col("vec_id") <= 9)
    val exact = SimilarityOps.bruteTopK(corpus, q, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.ivfPqTopK(corpus, q, 5, nprobe = np,
                                         shortlistFactor = slf,
                                         codebookEntries = 256)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact & approx).size.toDouble / exact.size
  }

  def main(args: Array[String]): Unit = {
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "synth:50000")
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    targets.foreach { t =>
      val corpus =
        (if (t.startsWith("synth:")) synth(spark, t.drop(6).toLong)
         else spark.read.parquet(s"$t/embeddings.parquet")
                .select(col("vec_id"), col("embedding")))
          .localCheckpoint(true)
      val n = corpus.count()
      val cells = SimilarityOps.donorCount(corpus)
      val np = SimilarityOps.scaledNprobe(cells)
      val slf = SimilarityOps.scaledShortlistFactor(n)
      val rFixed = recallAt(corpus, 16, 16)
      val rScaled = recallAt(corpus, np, slf)
      println(f"[micro-ann] $t%-28s n=$n%7d cells=$cells%4d | " +
        f"fixed(np=16,sl=80) recall@5=$rFixed%.3f | " +
        f"scaled(np=$np%3d,sl=${5 * slf}%4d) recall@5=$rScaled%.3f")
    }
    spark.stop()
  }
}
