package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers — the binding conventions of SURVEY.md §2.2 /
  * FIXTURES.md §3, shared by every declared query so Spark results
  * hash-match the DuckDB oracle.
  *
  * Cross-engine subtlety this module exists to absorb: Spark's `round` and
  * double→decimal casts round the double's *shortest decimal string*
  * (BigDecimal HALF_UP); DuckDB rounds the *binary* value. At a decimal tie
  * (x.xx5) the two disagree. So:
  *
  *  - fixture money columns carry exactly 2 decimals → casting them to
  *    DECIMAL(18,2) is tie-free and exact on both engines;
  *  - derived money (price·(1−discount)) is computed entirely in DECIMAL —
  *    never cast a product double;
  *  - every ROUND(x, 4) of a ratio p/q is integer half-up division:
  *    floor((20000·p + q) / (2·q)) / 10000.0 — all-integer, engine-agnostic.
  */
object Q {
  /** Exact cents representation for money/quantity doubles (2-dec source). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-insensitive exact sum of a money/value double, exported as DOUBLE. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact discounted revenue Σ price·(1−discount), all in DECIMAL. */
  def sumDiscounted(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1).cast(DecimalType(3, 2)) - dec2(discount)))
      .cast(DoubleType)

  /** Exact integer cents of a money sum. */
  def sumCents(c: Column): Column = (sum(dec2(c)) * 100).cast("long")

  /** Floor division on non-negative longs, exact (double div of exact
    * multiples below 2^53).
    */
  def intDiv(p: Column, q: Column): Column =
    ((p - pmod(p, q)) / q).cast("long")

  /** ROUND(p/q, 4) as exact integer half-up arithmetic, exported as DOUBLE. */
  def round4Ratio(p: Column, q: Column): Column =
    intDiv(p * 20000L + q, q * 2L) / 10000.0

  /** DuckDB SQL for the same: ROUND(p/q, 4). */
  def duckRound4Ratio(p: String, q: String): String =
    s"((20000 * ($p) + ($q)) // (2 * ($q))) / 10000.0"

  /** Deterministic AVG of a money double: exact cents, integer rounding. */
  def avg4(c: Column): Column = round4Ratio(sumCents(c), count(c) * 100L)

  /** Deterministic AVG of an exact integer column. */
  def avgInt4(c: Column): Column = round4Ratio(sum(c), count(c))

  /** Timestamp → epoch microseconds (matches DuckDB epoch_us). */
  def micros(c: Column): Column = unix_micros(c)

  /** Timestamp → 'yyyy-MM-dd' (matches DuckDB strftime '%Y-%m-%d'). */
  def day(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
