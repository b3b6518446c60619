package graft

import graft.operators.OrderOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off probe for the global-ordering operators (l51/l52): times the
  * two-pass range-partition construction against the naive
  * single-partition window on a synthetic narrow frame of `n` rows.
  *
  * The documents fixture cannot show this trade — sorting 80k two-column
  * rows in one task is free — so the probe generates the regime the
  * operator exists for: row counts where "move everything to one task"
  * is the dominant cost. Keys are deterministic (hash of the row id), no
  * RNG (probe reproducibility).
  *
  * Usage: `sbt "runMain graft.MicroOrder [n] [mode]"` — n rows (default
  * 10M), mode ∈ {order, cumsum, both} (default both). Prints min-of-3
  * seconds per variant.
  */
object MicroOrder {

  private def time(f: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val mode = if (args.length > 1) args(1) else "both"
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")

    // Narrow synthetic corpus: a quality key with heavy ties (10k distinct
    // values) + the unique id tiebreaker, and a 5-way group key with one
    // dominant group (60%) — the skew a real per-language window sees.
    val df = spark.range(n).select(
      col("id").as("doc_id"),
      pmod(hash(col("id")), lit(10000)).cast("long").as("q"),
      when(pmod(hash(col("id"), lit(1)), lit(10)) < 6, "en")
        .otherwise(concat(lit("l"), pmod(hash(col("id"), lit(2)), lit(4))))
        .as("lang"),
      (pmod(hash(col("id"), lit(3)), lit(100)) + 1).cast("long").as("v"))
      .localCheckpoint(true)
    val keys = Seq(col("q").desc, col("doc_id").asc)

    println(f"${"variant"}%-28s ${"rows"}%12s ${"sec"}%8s")
    if (mode == "order" || mode == "both") {
      val tTwo = time(sink(OrderOps.globalOrder(df, keys)))
      println(f"${"l51_two_pass"}%-28s $n%12d $tTwo%8.2f")
      val tNaive = time(sink(df.withColumn("global_pos",
        row_number().over(Window.orderBy(keys: _*)).cast("long") - 1L)))
      println(f"${"l51_naive_window"}%-28s $n%12d $tNaive%8.2f")
    }
    if (mode == "cumsum" || mode == "both") {
      val tTwo = time(sink(
        OrderOps.groupedRunningSum(df, Seq("lang"), keys, col("v"))))
      println(f"${"l52_two_pass"}%-28s $n%12d $tTwo%8.2f")
      val w = Window.partitionBy(col("lang")).orderBy(keys: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val tNaive = time(sink(df.withColumn("cum_before",
        coalesce(sum(col("v")).over(w), lit(0L)))))
      println(f"${"l52_naive_window"}%-28s $n%12d $tNaive%8.2f")
    }
    spark.stop()
  }
}
