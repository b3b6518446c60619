package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order position assignment — the distributed form of
  * `row_number() OVER (ORDER BY …)`.
  *
  * The naive formulation (an ORDER BY window with no PARTITION BY) funnels
  * the ENTIRE dataset through one task: Spark plans it as a single-partition
  * exchange + sort, so at 100 TB the job is one executor sorting 100 TB —
  * the canonical window-function scale-killer. Yet a curation pipeline
  * genuinely needs global positions: curriculum ordering ("train on the
  * highest-quality documents first"), deterministic shard assignment
  * ("document → output file + offset"), and reproducible corpus slicing all
  * key off a contiguous rank under a total order.
  *
  * This operator computes the same result in two distributed passes, the
  * classic range-partition + offset construction (TeraSort's ranking step):
  *
  *   1. `repartitionByRange(sortCols)` — Spark samples the key distribution
  *      and assigns contiguous key ranges to partitions, so partition i
  *      holds ranks strictly before partition i+1 (skew is absorbed by the
  *      sampler: heavy key ranges get narrower boundaries).
  *   2. Per-partition counts (one tiny P-row aggregate, P = cluster
  *      parallelism, NOT data-sized) prefix-summed into partition offsets —
  *      the only single-partition window in the plan runs over those P rows.
  *   3. A per-partition local rank (`row_number` PARTITIONED by the range
  *      partition id — every group is one range partition, fully parallel)
  *      plus the broadcast offset yields the global position.
  *
  * The output is boundary-independent: whatever boundaries the sampler
  * draws, position = |{rows strictly before me in the total order}| as long
  * as `sortCols` is a total order (callers must include a tiebreaker key).
  * No counterpart in the reference (its only ordering is the driver-side
  * dense assembly, `orchestrator/main.py:22-39`).
  */
object OrderOps {

  /** Append a contiguous 0-based `global_pos` under the total order given
    * by `sortCols`. `sortCols` MUST be a total order (include a unique
    * tiebreaker) — equal keys straddling a sampled range boundary would
    * otherwise rank nondeterministically.
    */
  def globalOrder(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // Eager localCheckpoint: the range boundaries are SAMPLED, and the
    // ranged frame feeds two consumers (the offset aggregate and the local
    // rank). Recomputing the exchange could draw different boundaries per
    // consumer, detaching the offsets from the partitions they measure.
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // P rows — bounded by the partition count (cluster parallelism), not
    // the data, so the single-partition prefix-sum window is O(P).
    val pw = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(pw), lit(0L)))
      .select(col("_pid"), col("_off"))
    // Partitioned window: one group per range partition — distributed; the
    // hash exchange on _pid moves whole partitions, never collapses them.
    val lw = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    ranged
      .withColumn("_lr", row_number().over(lw).cast("long") - lit(1L))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("global_pos", col("_off") + col("_lr"))
      .drop("_pid", "_lr", "_off")
  }

  /** Append `cum_before` — the running sum of `value` over rows strictly
    * before each row in the per-group total order — without the naive
    * `SUM OVER (PARTITION BY group ORDER BY …)` window, whose partitions
    * are DATA-sized (one task owns all of English at 100 TB; the l31
    * per-lang packing window is this shape's small-G regime). Same
    * two-pass construction as [[globalOrder]], generalized to groups:
    * range-partition on (group, sortCols) so each group spans a contiguous
    * run of partitions, partial-sum per (group, partition) cell — at most
    * P + G − 1 cells, parallelism- not data-sized — prefix-sum the cells
    * into per-(group, partition) offsets, then a per-partition local
    * running window (every window group ⊆ one range partition). `sortCols`
    * must be total within each group.
    */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
                        sortCols: Seq[Column], value: Column): DataFrame =
    groupedRunningSums(df, groupCols, sortCols, Seq("cum_before" -> value))

  /** Multi-summand form of [[groupedRunningSum]]: one range exchange, one
    * cell aggregate, and one local window carry ALL the running sums (a
    * caller needing both a rank counter and a flag sum — r38's shape —
    * must not pay the two-pass construction twice). Each (outName, value)
    * yields an exclusive-running-sum column `outName`.
    */
  def groupedRunningSums(df: DataFrame, groupCols: Seq[String],
                         sortCols: Seq[Column],
                         values: Seq[(String, Column)]): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val gc = groupCols.map(col)
    val vNames = values.indices.map(i => s"_v$i")
    val ranged = values.zip(vNames)
      .foldLeft(df) { case (acc, ((_, v), n)) => acc.withColumn(n, v) }
      .repartitionByRange(parts, gc ++ sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin sampled boundaries: two consumers
    val cells = ranged.groupBy(gc :+ col("_pid"): _*)
      .agg(vNames.map(n => sum(col(n)).as(s"_pn$n")).head,
           vNames.map(n => sum(col(n)).as(s"_pn$n")).tail: _*)
    // ≤ P rows per group in the cell frame — the offset window is
    // parallelism-sized regardless of data volume.
    val ow = Window.partitionBy(gc: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vNames
      .foldLeft(cells) { (acc, n) =>
        acc.withColumn(s"_goff$n",
          coalesce(sum(col(s"_pn$n")).over(ow), lit(0L)))
      }
      .select(gc ++ (col("_pid") +: vNames.map(n => col(s"_goff$n"))): _*)
    val lw = Window.partitionBy(col("_pid") +: gc: _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localled = vNames.foldLeft(ranged) { (acc, n) =>
      acc.withColumn(s"_lc$n", coalesce(sum(col(n)).over(lw), lit(0L)))
    }
    // Null-safe group equality: groupBy and the window both form a NULL
    // group, and the naive `PARTITION BY g` window this operator is
    // bit-equal to keeps NULL-key rows as their own partition — a plain
    // equi-join here would silently drop them.
    val offRenamed = groupCols
      .foldLeft(offsets.withColumnRenamed("_pid", "_opid")) { (a, c) =>
        a.withColumnRenamed(c, s"_g_$c")
      }
    val joinCond = groupCols.map(c => col(c) <=> col(s"_g_$c"))
      .foldLeft(col("_pid") === col("_opid"))(_ && _)
    val joined = localled.join(broadcast(offRenamed), joinCond)
      .drop("_opid")
      .drop(groupCols.map(c => s"_g_$c"): _*)
    values.map(_._1).zip(vNames)
      .foldLeft(joined) { case (acc, (out, n)) =>
        acc.withColumn(out, col(s"_goff$n") + col(s"_lc$n"))
      }
      .drop("_pid")
      .drop(vNames: _*)
      .drop(vNames.map(n => s"_lc$n"): _*)
      .drop(vNames.map(n => s"_goff$n"): _*)
  }
}
