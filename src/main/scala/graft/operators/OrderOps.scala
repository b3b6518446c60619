package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BaseOrdering, BoundReference, RowOrdering, SortOrder}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.RangeBucket

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
  * classic range-partition + offset construction (TeraSort's ranking step),
  * with the range boundaries made DETERMINISTIC up front:
  *
  *   1. Sample the sort key once (a reservoir sketch per input partition,
  *      weighted by partition size — one column-pruned pass), collect the
  *      B−1 boundary keys to the driver (KBs at ANY data volume), and bake
  *      them into a [[graft.functions.RangeBucket]] expression: bucket =
  *      binary search of the key against the boundary constants, O(log B)
  *      per row — the same per-row work `repartitionByRange`'s shuffle
  *      writer does.
  *   2. Per-bucket counts (one tiny ≤B-row aggregate, B ≈ 4× cluster
  *      parallelism, NOT data-sized) prefix-summed into bucket offsets —
  *      the only single-partition window in the plan runs over those rows.
  *   3. A per-bucket local rank (`row_number` PARTITIONED by the bucket id
  *      — every group is one key range, fully parallel) plus the broadcast
  *      offset yields the global position.
  *
  * Because the bucket id is a pure function of the row, the two consumers
  * of the bucketed frame (the count aggregate and the rank window) agree by
  * construction — no pinning, no materialization. Round 13 pinned the
  * sampled `repartitionByRange` boundaries with an eager
  * `localCheckpoint(true)` instead, which wrote a full second copy of the
  * corpus to non-replicated executor-local storage and truncated lineage
  * (one lost executor fails the job — the round-13 `weak`). This version
  * keeps lineage intact: a lost task recomputes from source, and the only
  * extra work vs the checkpoint is re-running the (column-pruned,
  * exchange-reused) upstream per consumer. 4× more buckets than shuffle
  * partitions smooth the hash placement of buckets onto reducers (balls-
  * into-bins: expected 4 buckets/task, so the worst task carries ~2× the
  * mean rather than the 3–4× of a 1:1 bucket:task hash).
  *
  * The output is boundary-independent: whatever boundaries the sampler
  * draws, position = |{rows strictly before me in the total order}| as long
  * as `sortCols` is a total order (callers must include a tiebreaker key).
  * No counterpart in the reference (its only ordering is the driver-side
  * dense assembly, `orchestrator/main.py:22-39`).
  */
object OrderOps {

  /** Internal column names; inputs must not collide (ADVICE r13). */
  private val reservedPrefixes = Seq("_bkt", "_v", "_lc", "_goff", "_pn",
    "_opid", "_g_", "_n", "_off", "_lr")

  private def assertNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.filter(c => reservedPrefixes.exists(c.startsWith))
    require(clash.isEmpty,
      s"OrderOps reserves internal column prefixes ${reservedPrefixes.mkString(", ")}; " +
        s"rename input columns ${clash.mkString(", ")}")
  }

  /** Shuffle-partition count with a non-numeric fallback ("auto" is legal
    * under AQE advisory partitioning — ADVICE r13).
    */
  private def numShufflePartitions(df: DataFrame): Int =
    scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    ).getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** Normalize user sort columns to Catalyst `SortOrder`s (bare columns
    * default to ascending, nulls-first — Spark's `ORDER BY` default).
    */
  private def toSortOrders(sortCols: Seq[Column]): Seq[SortOrder] =
    sortCols.map(GraftSqlShim.sortOrder)

  /** Build the deterministic bucket column for `df` under `orders`:
    * ONE reservoir-sketch pass over the (column-pruned) sort key, a
    * driver-side weighted-quantile boundary pick, and a [[RangeBucket]]
    * binary-search expression over the collected boundary constants.
    *
    * The sketch mirrors the public `RangePartitioner` design (sample ~20
    * keys per target bucket, weight each retained key by the rows it
    * represents so unevenly-sized input partitions don't skew the
    * quantiles, cap the driver haul at ~1M keys). Heavy key ranges get
    * narrower boundaries, absorbing skew exactly as `repartitionByRange`
    * would — but the boundaries are then CONSTANTS, shared by every
    * consumer of the returned column.
    */
  private def bucketColumn(df: DataFrame, orders: Seq[SortOrder],
                           buckets: Int): Column = {
    val keyDF = df.select(orders.zipWithIndex.map { case (o, i) =>
      GraftSqlShim.column(o.child).as(s"_k$i")
    }: _*)
    val schema = keyDF.schema
    val ord: BaseOrdering = RowOrdering.create(
      orders.zipWithIndex.map { case (o, i) =>
        SortOrder(BoundReference(i, schema(i).dataType, nullable = true),
          o.direction, o.nullOrdering, Seq.empty)
      },
      Nil)
    val rdd = keyDF.queryExecution.toRdd
    val nParts = math.max(rdd.getNumPartitions, 1)
    val perPart = math.max(20, math.min(20 * buckets, 1000000 / nParts))
    val sketch = rdd.mapPartitionsWithIndex { (idx, it) =>
      // Algorithm-R reservoir, deterministically seeded per partition.
      val rng = new java.util.Random(0x9e3779b97f4a7c15L ^ idx)
      val reservoir = new Array[InternalRow](perPart)
      var n = 0L
      while (it.hasNext) {
        val row = it.next()
        if (n < perPart) reservoir(n.toInt) = row.copy()
        else {
          val j = (rng.nextDouble() * (n + 1)).toLong
          if (j < perPart) reservoir(j.toInt) = row.copy()
        }
        n += 1
      }
      Iterator.single((n, reservoir.take(math.min(n, perPart.toLong).toInt)))
    }.collect()
    val weighted = sketch.filter(_._1 > 0L).flatMap { case (n, arr) =>
      val w = n.toDouble / arr.length
      arr.map(r => (r, w))
    }
    val bnds = new ArrayBuffer[InternalRow]
    if (weighted.nonEmpty) {
      val sorted = weighted.sortWith((a, b) => ord.compare(a._1, b._1) < 0)
      val step = sorted.iterator.map(_._2).sum / buckets
      var cum = 0.0
      var target = step
      var i = 0
      while (i < sorted.length && bnds.length < buckets - 1) {
        cum += sorted(i)._2
        if (cum >= target) {
          val key = sorted(i)._1
          // strictly increasing boundaries: equal keys share a bucket
          if (bnds.isEmpty || ord.compare(bnds.last, key) < 0) bnds += key
          while (target <= cum) target += step
        }
        i += 1
      }
    }
    GraftSqlShim.column(RangeBucket(
      orders.map(_.child),
      orders.map(o => (o.direction, o.nullOrdering)),
      bnds.toArray))
  }

  /** Append a contiguous 0-based `global_pos` under the total order given
    * by `sortCols`. `sortCols` MUST be a total order (include a unique
    * tiebreaker) — equal keys straddling a bucket boundary would otherwise
    * rank nondeterministically.
    */
  def globalOrder(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    assertNoReserved(df)
    val buckets = 4 * numShufflePartitions(df)
    val orders = toSortOrders(sortCols)
    val ranged = df.withColumn("_bkt", bucketColumn(df, orders, buckets))
    // ≤ B rows — bounded by the bucket count (≈ 4× parallelism), not the
    // data, so the single-partition prefix-sum window is O(B).
    val pw = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("_bkt")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(pw), lit(0L)))
      .select(col("_bkt"), col("_off"))
    // Partitioned window: one group per key-range bucket — distributed;
    // the hash exchange on _bkt moves whole buckets, never collapses them.
    val lw = Window.partitionBy(col("_bkt")).orderBy(sortCols: _*)
    ranged
      .withColumn("_lr", row_number().over(lw).cast("long") - lit(1L))
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("global_pos", col("_off") + col("_lr"))
      .drop("_bkt", "_lr", "_off")
  }

  /** Append `cum_before` — the running sum of `value` over rows strictly
    * before each row in the per-group total order — without the naive
    * `SUM OVER (PARTITION BY group ORDER BY …)` window, whose partitions
    * are DATA-sized (one task owns all of English at 100 TB; the l31
    * per-lang packing window is this shape's small-G regime). Same
    * two-pass construction as [[globalOrder]], generalized to groups:
    * range-bucket on (group, sortCols) so each group spans a contiguous
    * run of buckets, partial-sum per (group, bucket) cell — at most
    * B + G − 1 cells, parallelism- not data-sized — prefix-sum the cells
    * into per-(group, bucket) offsets, then a per-bucket local running
    * window (every window group ⊆ one bucket). `sortCols` must be total
    * within each group.
    */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
                        sortCols: Seq[Column], value: Column): DataFrame =
    groupedRunningSums(df, groupCols, sortCols, Seq("cum_before" -> value))

  /** Multi-summand form of [[groupedRunningSum]]: one bucket pass, one
    * cell aggregate, and one local window carry ALL the running sums (a
    * caller needing both a rank counter and a flag sum — r38's shape —
    * must not pay the two-pass construction twice). Each (outName, value)
    * yields an exclusive-running-sum column `outName`.
    */
  def groupedRunningSums(df: DataFrame, groupCols: Seq[String],
                         sortCols: Seq[Column],
                         values: Seq[(String, Column)]): DataFrame = {
    assertNoReserved(df)
    val buckets = 4 * numShufflePartitions(df)
    val gc = groupCols.map(col)
    val orders = toSortOrders(groupCols.map(c => col(c).asc) ++ sortCols)
    val vNames = values.indices.map(i => s"_v$i")
    val ranged = values.zip(vNames)
      .foldLeft(df) { case (acc, ((_, v), n)) => acc.withColumn(n, v) }
      .withColumn("_bkt", bucketColumn(df, orders, buckets))
    val cells = ranged.groupBy(gc :+ col("_bkt"): _*)
      .agg(vNames.map(n => sum(col(n)).as(s"_pn$n")).head,
           vNames.map(n => sum(col(n)).as(s"_pn$n")).tail: _*)
    // ≤ B rows per group in the cell frame — the offset window is
    // parallelism-sized regardless of data volume.
    val ow = Window.partitionBy(gc: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vNames
      .foldLeft(cells) { (acc, n) =>
        acc.withColumn(s"_goff$n",
          coalesce(sum(col(s"_pn$n")).over(ow), lit(0L)))
      }
      .select(gc ++ (col("_bkt") +: vNames.map(n => col(s"_goff$n"))): _*)
    val lw = Window.partitionBy(col("_bkt") +: gc: _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localled = vNames.foldLeft(ranged) { (acc, n) =>
      acc.withColumn(s"_lc$n", coalesce(sum(col(n)).over(lw), lit(0L)))
    }
    // Null-safe group equality: groupBy and the window both form a NULL
    // group, and the naive `PARTITION BY g` window this operator is
    // bit-equal to keeps NULL-key rows as their own partition — a plain
    // equi-join here would silently drop them.
    val offRenamed = groupCols
      .foldLeft(offsets.withColumnRenamed("_bkt", "_opid")) { (a, c) =>
        a.withColumnRenamed(c, s"_g_$c")
      }
    val joinCond = groupCols.map(c => col(c) <=> col(s"_g_$c"))
      .foldLeft(col("_bkt") === col("_opid"))(_ && _)
    val joined = localled.join(broadcast(offRenamed), joinCond)
      .drop("_opid")
      .drop(groupCols.map(c => s"_g_$c"): _*)
    values.map(_._1).zip(vNames)
      .foldLeft(joined) { case (acc, (out, n)) =>
        acc.withColumn(out, col(s"_goff$n") + col(s"_lc$n"))
      }
      .drop("_bkt")
      .drop(vNames: _*)
      .drop(vNames.map(n => s"_lc$n"): _*)
      .drop(vNames.map(n => s"_goff$n"): _*)
  }
}
