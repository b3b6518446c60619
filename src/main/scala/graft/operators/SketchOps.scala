package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators — the fixed-size-summary family a 100 TB
  * pipeline leans on when exact aggregation is the bottleneck. Sibling of
  * the GK-quantile (l13b) and HLL (r30) verdict gates: sketch CONTENTS are
  * engine-specific, so gates here export exact values plus a declared
  * error band the sketch must sit inside, and the oracle replays the exact
  * side + the literal verdict (the round-8 "verdict shape").
  */
object SketchOps {

  /** Count-min-sketch heavy-hitter verification (the L58 gate, Cormode &
    * Muthukrishnan 2005): per language, the exact top-`k` tokens (count
    * desc, token asc — a total order) are probed against a per-language
    * count-min sketch built by Spark's `count_min_sketch` aggregate, and
    * the CMS guarantee is hash-enforced as a verdict band:
    *
    *   exact ≤ estimate ≤ exact + ⌈eps · N_lang⌉    (w.p. ≥ confidence)
    *
    * The lower bound is UNCONDITIONAL (CMS never under-counts: every probe
    * reads cells the item itself incremented), the upper holds with
    * probability `confidence` per probe — at eps 0.001 / confidence 0.99
    * on the fixture's bounded vocabulary the slack is never exercised, so
    * `within_band` is deterministically true and the oracle asserts it as
    * a literal alongside the exact counts (estimates themselves depend on
    * Spark's hash family and stay OUT of the hash, like r30's HLL values).
    *
    * Why this matters at 100 TB: the exact top-k here needs a full
    * (lang, token) aggregate; production swaps that for the sketch ALONE
    * — CMS partials are fixed-size (⌈2/eps⌉ × depth counters), build
    * map-side, and merge associatively across any partitioning, so "how
    * hot is this token" never rescans the corpus. This gate pins that the
    * sketch the engine would ship is actually within its advertised band
    * of the exact answer it replaces.
    *
    * Driver-side work is bounded by construction: one sketch row per
    * language (the sketch is ~⌈2e/eps⌉·5 longs regardless of data size —
    * collecting it IS the operator's point) and `k` probe rows per
    * language; both re-enter the plan as a broadcast join against the
    * distributed exact pipeline. `lang` joins are plain equality — the
    * corpus guarantees non-null language labels (TESTDATA.md), and the
    * exact and probe sides derive from the same grouped frame either way.
    */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 5, epsInv: Long = 1000L,
                      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    // eps = 1/epsInv, and the band's ⌈eps·N⌉ is computed as the INTEGER
    // (N + epsInv − 1) div epsInv on both engines — double `ceil(N·0.001)`
    // and DuckDB's DECIMAL-literal ceil disagree exactly at the multiples
    // (18000·0.001 = 18.000000000000004 in binary), which would make the
    // hash flap with corpus size.
    val eps = 1.0 / epsInv
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("lang"),
        explode(TextFunctions.tokens("text")).as("token"))
      .persist()
    try {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("token").asc)
      val top = toks.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .persist()
      top.count() // materialize once; consumed by the probe collect + join
      val totals = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_tokens"))
      val sketches: Map[String, CountMinSketch] = toks
        .groupBy(col("lang"))
        .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)")
          .as("sk"))
        .collect()
        .map(r => r.getString(0) -> CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("sk"))))
        .toMap
      val probes = top.select(col("lang"), col("token")).collect().toSeq
        .map(r => (r.getString(0), r.getString(1),
                   sketches(r.getString(0)).estimateCount(r.getString(1))))
        .toDF("lang", "token", "est")
      val slack = expr(s"(n_tokens + ${epsInv - 1}) div $epsInv")
      val out = top.join(totals, Seq("lang"))
        .join(broadcast(probes), Seq("lang", "token"))
        .select(col("lang"), col("rnk"), col("token"), col("cnt"),
          col("n_tokens"),
          (col("cnt") + slack).as("cms_bound"),
          (col("est") >= col("cnt") && col("est") <= col("cnt") + slack)
            .as("within_band"))
        .orderBy("lang", "rnk")
        .localCheckpoint(true) // tiny: ≤ k rows per language, eager —
                               // safe to drop the cached inputs below
      top.unpersist(blocking = false)
      out
    } finally {
      toks.unpersist(blocking = false)
    }
  }
}
