package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.Q
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector mean as a typed `Aggregator` — the declared custom
  * UDAF milestone (SURVEY.md §2.2 L6).
  *
  * Determinism design: float addition is not associative, and Spark's
  * aggregation order over partitions is nondeterministic — a naive
  * double-sum centroid cannot hash-match an oracle. Instead each float32
  * component is encoded as the exact integer v·2^45 ([[graft.Q.fp45]]
  * rationale: a float's 24-bit mantissa makes that product exact for
  * |v| ≥ 2^-22), the partial sums are exact LONG adds (order-free,
  * map-side combinable, mergeable across partitions — precisely the
  * contract `Aggregator.merge` needs), and `finish` rounds the exact
  * rational Σv / n to 4 decimals with HALF_UP BigDecimal division.
  *
  * Scale posture: the buffer is one `Array[Long](dim)` + a count — fixed
  * size regardless of group cardinality, so partial aggregation works at
  * any row count. Long overflow headroom: |term| ≤ 2^45, so ~2^18 ≈ 262k
  * max-magnitude rows per group fit even in the worst case; real
  * embedding sums are random-sign. A 100 TB build would widen the buffer
  * to 128-bit (two longs) — noted, not needed at fixture scale.
  */
class VectorMean(dim: Int) extends Aggregator[Seq[Float], VectorMean.Buf, Seq[Double]] {
  import VectorMean.Buf

  override def zero: Buf = Buf(0L, Array.fill(dim)(0L))

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    require(v.length == dim, s"expected $dim dims, got ${v.length}")
    var i = 0
    while (i < dim) {
      val d = v(i).toDouble * Q.Fp45
      // Exactness precondition enforced, not assumed (r2/r3 ADVICE): the
      // fixed-point encoding is lossless iff v·2^45 is an integer (true for
      // |v| ≥ 2^-22 or v = 0 on float32 input). A violating component —
      // including NaN/Inf — must fail loudly here, never silently
      // desynchronize from the integer-arithmetic oracle.
      require(d == math.rint(d),
        s"VectorMean: component $i value ${v(i)} is not exactly representable " +
          s"as v*2^45 (|v| >= 2^-22 precondition); widen the encoding for this corpus")
      b.sums(i) += d.toLong
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  /** Exact rational mean sums/(n·2^45), rounded half away from zero to 4
    * decimals — matches the oracle's integer HUGEINT formula.
    */
  override def finish(b: Buf): Seq[Double] = {
    val q = new JBigDecimal(b.n).multiply(new JBigDecimal(Q.Fp45))
    b.sums.toSeq.map { s =>
      new JBigDecimal(s).divide(q, 4, RoundingMode.HALF_UP).doubleValue
    }
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object VectorMean {
  /** Fixed-size partial state: exact fixed-point component sums + count. */
  case class Buf(var n: Long, sums: Array[Long])
}
