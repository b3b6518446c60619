package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the single right row with the
  * greatest `on` value ≤ the left row's `on` within the same `by` group
  * (the kdb `aj` / pandas `merge_asof` semantics): the "latest state at
  * event time" lookup a feature or training pipeline runs against quotes,
  * sensor readings, or slowly-changing dimensions.
  *
  * Spark has no native as-of join, and the two obvious formulations fail
  * at scale: a range join explodes candidates with time-range density,
  * and a per-left-row aggregate subquery rescans the right side. This is
  * the MERGE formulation instead: union both sides, shuffle once on the
  * `by` key, and let one ordered window pass carry the latest right row
  * (as a running `max` over a struct) to each left row.
  *
  * 100 TB posture: cost is exactly a sort-merge join's — one exchange of
  * |L|+|R| rows on `by` plus a per-partition sort — independent of how
  * many right rows precede each left row. No state blow-up, no candidate
  * explosion; skew follows the `by` key's own distribution (salt upstream
  * if one group dominates).
  *
  * Determinism: the right row is selected by lexicographic max of
  * `(on, tieBreak)`, so ties on `on` resolve to the greatest `tieBreak` —
  * no dependence on sort stability or arrival order. The frame is a RANGE
  * frame over `on`, so a right row at exactly the left row's `on` is
  * matched (inclusive as-of, the common convention).
  *
  * Reference scope note: the reference engine (orchestrator/main.py) has
  * no temporal operators at all; this op is part of the extended declared
  * surface (SURVEY.md §2.2 S7).
  */
object AsOfJoin {

  /** Columns of `right` carried to the match: `on` and `tieBreak` always
    * travel (they define the match); `payload` adds more. The result is
    * `left.*` plus a struct column `asof` = the matched right row's
    * `(on, tieBreak, payload...)`, or NULL when no right row matches.
    *
    * `direction` selects the pandas `merge_asof` family member:
    *  - `"backward"` (default): greatest right `on` ≤ left `on`; ties on
    *    `on` resolve to the GREATEST `tieBreak` (struct max).
    *  - `"forward"`: smallest right `on` ≥ left `on`; ties resolve to the
    *    SMALLEST `tieBreak` (struct min — the mirror convention).
    *  - `"nearest"`: whichever of the two is closer in `on`; EQUAL
    *    distance prefers backward (stated convention, deterministic).
    *    Both candidates come from the same one-shuffle pass — two window
    *    frames over one partition sort, still no candidate explosion.
    */
  def asOf(left: DataFrame, right: DataFrame, by: Seq[String], on: String,
           tieBreak: String, payload: Seq[String] = Nil,
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction $direction")
    val carried = (on +: tieBreak +: payload).distinct
    val rStruct = struct(carried.map(col): _*)
    val r = right.select(by.map(col) :+ col(on) :+ rStruct.as("__asof_r"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    // unionByName fills the columns each side lacks with NULLs — left rows
    // get a NULL __asof_r, right rows NULL left-payload columns.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // RANGE frames over `on`: peers (equal `on`) are in-frame regardless
    // of physical order, so tie handling is purely the struct extremum's.
    val base = Window.partitionBy(by.map(col): _*).orderBy(col(on))
    val wb = base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val withPick = direction match {
      case "backward" =>
        unioned.withColumn("asof", max(col("__asof_r")).over(wb))
      case "forward" =>
        unioned.withColumn("asof", min(col("__asof_r")).over(wf))
      case "nearest" =>
        // Distances compare in an exact domain per `on` type (r8 ADVICE:
        // a blanket double cast loses integer precision past 2^53, so
        // near-ties on a wide BIGINT key could resolve to the wrong
        // side, and a DATE key failed the cast outright): micros for
        // timestamps, epoch days for dates, LONG for integrals, native
        // decimal for decimals (exact subtraction); double only for
        // genuine float inputs.
        val toNum: org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
          import org.apache.spark.sql.types._
          left.schema(on).dataType match {
            case _: TimestampType => unix_micros
            case _: TimestampNTZType => c => unix_micros(c.cast("timestamp"))
            case _: DateType => unix_date(_).cast("long")
            case ByteType | ShortType | IntegerType | LongType => _.cast("long")
            case _: DecimalType => identity
            case _ => _.cast("double")
          }
        }
        val b = max(col("__asof_r")).over(wb)
        val f = min(col("__asof_r")).over(wf)
        unioned
          .withColumn("__b", b).withColumn("__f", f)
          .withColumn("asof",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(toNum(col("__f").getField(on)) - toNum(col(on)) <
                    toNum(col(on)) - toNum(col("__b").getField(on)),
                    col("__f"))
              .otherwise(col("__b")))
          .drop("__b", "__f")
    }
    withPick
      .filter(col("__side") === 1)
      .drop("__asof_r", "__side")
  }
}
