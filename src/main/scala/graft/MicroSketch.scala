package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe for the l62/l63 scale claim: per-group distinct
  * cardinality by exact COUNT(DISTINCT) vs the fixed-state KMV sketch
  * ([[graft.functions.BottomK]]) as the distinct universe grows.
  *
  * The documents fixture cannot show this trade (≤ ~10⁵ distinct grams);
  * the probe generates the regime the sketch exists for — group-key ×
  * high-cardinality value pairs where the exact plan's shuffled state is
  * the distinct universe itself (Expand + per-(group, value) hash rows)
  * while the sketch ships one k·8-byte buffer per group per map task.
  * Values are deterministic hashes of the row id (no RNG); ~12.5% value
  * duplication via a modulus keeps the dedup path honest.
  *
  * Usage: `sbt "runMain graft.MicroSketch [n] [groups] [k] [passes]"`.
  */
object MicroSketch {

  private var passes = 3

  private def time(f: => Unit): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val groups = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 256
    passes = if (args.length > 3) args(3).toInt else 3
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")

    def gen: DataFrame = spark.range(n).select(
      pmod(hash(col("id")), lit(groups)).as("g"),
      pmod(hash(col("id"), lit(7)).cast("long") * 2654435761L,
           lit(n.max(1024) / 8 * 7)).as("v"))

    val bottomK = udaf(new graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.scalaLong)

    val tSketch = time(sink(gen.groupBy(col("g")).agg(bottomK(col("v")).as("bk"))))
    val tExact = time(sink(gen.groupBy(col("g"))
      .agg(count_distinct(col("v")).as("nd"))))
    println(f"[micro-sketch] n=$n groups=$groups k=$k " +
      f"sketch=$tSketch%.2f s exact=$tExact%.2f s (min of $passes)")
    spark.stop()
  }
}
