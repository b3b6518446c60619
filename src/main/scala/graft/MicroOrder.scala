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
  * Usage: `sbt "runMain graft.MicroOrder [n] [mode] [passes] [variant]"`
  * — n rows (default 10M), mode ∈ {order, cumsum, both} (default both),
  * passes (default 3 — min-of-passes per variant; use 1 for the
  * hundred-second rungs where a triple pass buys nothing but wall-clock),
  * variant ∈ {both, two, naive} (default both — `two` times only the
  * two-pass operators, so a rung whose naive window is a known
  * multi-hour/one-task DNF can still record its two-pass number), and
  * pin ∈ {pin, nopin} (default pin — eagerly checkpoint the generated
  * input so its cost stays out of the timings; `nopin` regenerates it
  * inline per pass, REQUIRED at the 1B rung where the ~37 GB input copy
  * plus the operator's own exchange + sort spill exceeds this host's
  * ~80 GB free disk — the generator is a codegen'd range + hash
  * projection, so the inline cost is noise next to the shuffle).
  */
object MicroOrder {

  private var passes = 3

  private def time(f: => Unit): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val mode = if (args.length > 1) args(1) else "both"
    passes = if (args.length > 2) args(2).toInt else 3
    val variant = if (args.length > 3) args(3) else "both"
    val pin = if (args.length > 4) args(4) else "pin"
    require(Set("pin", "nopin")(pin), s"pin must be pin|nopin, got '$pin'")
    require(Set("both", "two", "naive")(variant),
      s"variant must be both|two|naive, got '$variant'")
    require(Set("order", "cumsum", "both")(mode),
      s"mode must be order|cumsum|both, got '$mode'")
    val runTwo = variant == "both" || variant == "two"
    val runNaive = variant == "both" || variant == "naive"
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")

    // Narrow synthetic corpus: a quality key with heavy ties (10k distinct
    // values) + the unique id tiebreaker, and a 5-way group key with one
    // dominant group (60%) — the skew a real per-language window sees.
    val raw = spark.range(n).select(
      col("id").as("doc_id"),
      pmod(hash(col("id")), lit(10000)).cast("long").as("q"),
      when(pmod(hash(col("id"), lit(1)), lit(10)) < 6, "en")
        .otherwise(concat(lit("l"), pmod(hash(col("id"), lit(2)), lit(4))))
        .as("lang"),
      (pmod(hash(col("id"), lit(3)), lit(100)) + 1).cast("long").as("v"))
    val df = if (pin == "pin") raw.localCheckpoint(true) else raw
    val keys = Seq(col("q").desc, col("doc_id").asc)

    println(f"${"variant"}%-28s ${"rows"}%12s ${"sec"}%8s")
    if (mode == "order" || mode == "both") {
      if (runTwo) {
        val tTwo = time(sink(OrderOps.globalOrder(df, keys)))
        println(f"${"l51_two_pass"}%-28s $n%12d $tTwo%8.2f")
      }
      if (runNaive) {
        val tNaive = time(sink(df.withColumn("global_pos",
          row_number().over(Window.orderBy(keys: _*)).cast("long") - 1L)))
        println(f"${"l51_naive_window"}%-28s $n%12d $tNaive%8.2f")
      }
    }
    if (mode == "cumsum" || mode == "both") {
      if (runTwo) {
        val tTwo = time(sink(
          OrderOps.groupedRunningSum(df, Seq("lang"), keys, col("v"))))
        println(f"${"l52_two_pass"}%-28s $n%12d $tTwo%8.2f")
      }
      if (runNaive) {
        val w = Window.partitionBy(col("lang")).orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val tNaive = time(sink(df.withColumn("cum_before",
          coalesce(sum(col("v")).over(w), lit(0L)))))
        println(f"${"l52_naive_window"}%-28s $n%12d $tNaive%8.2f")
      }
    }
    spark.stop()
  }
}
