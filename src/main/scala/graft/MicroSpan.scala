package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe that CHOSE the l65/s31 span-dedup plan: three
  * formulations of the first-occurrence verdict raced on two synthetic
  * regimes, with the winner shipped in
  * [[graft.operators.DedupOps.spanDedup]].
  *
  *  - "window" (SHIPPED): `row_number() OVER (PARTITION BY gram ORDER BY
  *    doc_id, s)` — one occurrence build, one shuffle, one per-gram sort,
  *    no join. Per-gram partitions are gram-frequency-sized (content-
  *    bounded), NOT the data-sized per-language/per-status partitions
  *    earlier rounds replaced.
  *  - "reuse": min-(doc,s) hash aggregate + join back, with one explicit
  *    `repartition(gram)` feeding both sides so ReuseExchange builds and
  *    shuffles the occurrence table exactly once; the hot-gram join stays
  *    AQE-skew-splittable where a window partition never is.
  *  - "naive": the same aggregate + join WITHOUT the pinned repartition —
  *    the aggregate's map-side partials make its exchange structurally
  *    different from the join probe's, so the occurrence build runs twice.
  *
  * Regimes (fully deterministic, hash-derived words, no RNG; 60 tokens
  * per doc, 30k vocabulary):
  *  - "boiler": a fixed 20-token run planted at positions 20–39 of every
  *    2nd doc — many moderately-hot grams, the benign web-corpus shape;
  *  - "template": 90% of docs are one cycling 6-token template (token 0
  *    unique) — SIX grams carry ~80% of ALL occurrences, fewer hot keys
  *    than executor lanes, the SEO-spam shape built to serialize the
  *    window's sort.
  *
  * Measured (local[32], min of 2): window wins BOTH regimes — 2.2× over
  * naive-join at boiler/100k (4.3 vs 9.5–12.6 s), 1.2× over reuse at
  * template/1.6M (48.4 vs 58.0 s) — because the join paths' extra agg +
  * probe passes cost more than the window's serialized hot sort saves at
  * ≤32 lanes. The documented flip: hot grams FEWER than the cluster's
  * lanes AND hotter than the per-lane share (single-template corpora at
  * ≥256 lanes) — there the unsplittable sort loses and the reuse join is
  * the right plan. Verdict equality of all three is asserted on a 2k-doc
  * prefix every run.
  *
  * Usage: `sbt "runMain graft.MicroSpan [nDocs] [passes] [boiler|template]
  * [variants-csv]"`.
  */
object MicroSpan {

  private var passes = 3

  private def time(f: => Unit): Double =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Exchange-reuse join rival (see object scaladoc). */
  private def spanDedupReuse(docs: DataFrame, n: Int,
                             pin: Boolean): DataFrame = {
    val occ0 = graft.operators.DedupOps.spanOccurrences(docs, n)
    val occ = if (pin) occ0.repartition(col("gram")) else occ0
    val first = occ.groupBy(col("gram"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"))
    val dups = occ.join(first, "gram")
      .filter(struct(col("doc_id"), col("s")) =!= col("f"))
      .select(col("doc_id"), col("s"))
    graft.operators.DedupOps.spanMask(docs, dups, n)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 400000L
    passes = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "boiler"
    val variants: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set("window", "reuse", "naive")
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")

    def gen: DataFrame = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr(
        if (mode == "template")
          """transform(sequence(0, 59), i ->
            |  CASE WHEN id % 10 = 0 OR i = 0
            |         THEN concat('w', pmod(hash(id, i), 30000))
            |       ELSE concat('b', pmod(i, 6)) END)""".stripMargin
        else
          """transform(sequence(0, 59), i ->
            |  CASE WHEN id % 2 = 0 AND i >= 20 AND i < 40 THEN concat('b', i)
            |       ELSE concat('w', pmod(hash(id, i), 30000)) END)"""
            .stripMargin)).as("text"))

    // Verdict equality on a small prefix (cheap, every run): the rivals
    // must be pure plan alternatives, never semantic ones.
    val small = gen.limit(2000).localCheckpoint(true)
    val a = graft.operators.DedupOps.spanDedup(small, 6)
      .orderBy("doc_id").collect().toSeq
    require(a == spanDedupReuse(small, 6, pin = true)
              .orderBy("doc_id").collect().toSeq,
            "reuse rival diverged from the shipped window formulation")
    require(a == spanDedupReuse(small, 6, pin = false)
              .orderBy("doc_id").collect().toSeq,
            "naive rival diverged from the shipped window formulation")

    def maybe(name: String)(f: => Unit): Option[Double] =
      if (variants(name)) Some(time(f)) else None
    val tWin = maybe("window")(
      sink(graft.operators.DedupOps.spanDedup(gen, 6)))
    val tReuse = maybe("reuse")(sink(spanDedupReuse(gen, 6, pin = true)))
    val tNaive = maybe("naive")(sink(spanDedupReuse(gen, 6, pin = false)))
    def fmt(t: Option[Double]) = t.fold("-")(v => f"$v%.2f")
    println(s"[micro-span] mode=$mode docs=$nDocs tokens=${nDocs * 60} " +
      s"window=${fmt(tWin)} s reuse=${fmt(tReuse)} s naive=${fmt(tNaive)} s " +
      s"(min of $passes)")
    spark.stop()
  }
}
