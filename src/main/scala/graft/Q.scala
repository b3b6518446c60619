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

  private val Dec38 = DecimalType(38, 0)

  /** Floor division on non-negative integral (long or decimal) columns,
    * exact at any magnitude that fits DECIMAL(38): operands are lifted to
    * DECIMAL(38,0), the remainder is subtracted, and the now-exact-multiple
    * division cannot round (the r3 ceiling: the former double division was
    * exact only below 2^53 — silent corruption for cents sums at 100×
    * scale). The QUOTIENT must fit a LONG (callers compute averages and
    * scaled ratios, bounded by the data's value range, not its row count).
    */
  def intDiv(p: Column, q: Column): Column = {
    val pd = p.cast(Dec38)
    val qd = q.cast(Dec38)
    ((pd - pmod(pd, qd)) / qd).cast("long")
  }

  /** ROUND(p/q, 4) as exact integer half-up arithmetic, exported as DOUBLE.
    * The numerator is built in DECIMAL(38,0) so `p·20000` cannot overflow a
    * LONG for any realistic cents sum (LONG caps at p ≈ 4.6·10^14 there).
    */
  def round4Ratio(p: Column, q: Column): Column =
    intDiv(p.cast(Dec38) * 20000L + q.cast(Dec38), q.cast(Dec38) * 2L) / 10000.0

  /** DuckDB SQL for the same: ROUND(p/q, 4). HUGEINT keeps the oracle's
    * headroom symmetric with the Spark side's DECIMAL(38) lift.
    */
  def duckRound4Ratio(p: String, q: String): String =
    s"((20000 * CAST(($p) AS HUGEINT) + ($q)) // (2 * CAST(($q) AS HUGEINT))) / 10000.0"

  /** Deterministic AVG of a money double: exact cents, integer rounding. */
  def avg4(c: Column): Column = round4Ratio(sumCents(c), count(c) * 100L)

  /** Deterministic AVG of an exact integer column. */
  def avgInt4(c: Column): Column = round4Ratio(sum(c), count(c))

  /** ROUND(p/q, 4) for possibly-negative p (q > 0): round half AWAY FROM
    * ZERO, the HALF_UP convention both engines use. Implemented as trunc
    * division on |p| because DuckDB's `//` truncates toward zero for
    * integers while Spark's [[intDiv]] floors — they agree only on
    * non-negative operands, so the sign is split out first.
    */
  def round4RatioSigned(p: Column, q: Column): Column = {
    val r = intDiv(abs(p).cast(Dec38) * 20000L + q.cast(Dec38),
                   q.cast(Dec38) * 2L)
    when(p < 0, -r).otherwise(r) / 10000.0
  }

  /** DuckDB SQL for [[round4RatioSigned]]. */
  def duckRound4RatioSigned(p: String, q: String): String =
    s"(CASE WHEN ($p) < 0 THEN -((20000 * CAST(-($p) AS HUGEINT) + ($q)) // (2 * CAST(($q) AS HUGEINT))) " +
      s"ELSE ((20000 * CAST(($p) AS HUGEINT) + ($q)) // (2 * CAST(($q) AS HUGEINT))) END) / 10000.0"

  /** Fixed-point shift for float-origin embedding values: 2^45.
    *
    * A float32 has a 24-bit mantissa, so for |v| ≥ 2^-22 (or v = 0) the
    * double v·2^45 is an exact integer — multiplication by a power of two
    * only shifts the exponent. Encoding each component this way makes
    * vector sums exact LONG arithmetic: order-free, overflow-checked by
    * range (|term| ≤ 2^45·|v|max), and bit-identical across engines —
    * which is what lets the L6 centroid aggregate be a genuinely
    * distributable [[graft.functions.VectorMean]] instead of an
    * order-pinned fold. (FIXTURES.md embeddings satisfy the |v| ≥ 2^-22
    * precondition; a production build would widen to BigInt on violation.)
    */
  val Fp45: Long = 1L << 45

  /** Exact fixed-point encoding v·2^45 of a float-origin column. */
  def fp45(c: Column): Column = (c.cast(DoubleType) * lit(Fp45.toDouble)).cast("long")

  /** Timestamp → epoch microseconds (matches DuckDB epoch_us). */
  def micros(c: Column): Column = unix_micros(c)

  /** Timestamp → 'yyyy-MM-dd' (matches DuckDB strftime '%Y-%m-%d'). */
  def day(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
