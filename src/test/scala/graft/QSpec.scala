package graft

import graft.functions.VectorMean
import org.apache.spark.sql.functions._

/** Determinism-helper precision: DECIMAL-lifted floor division beyond the
  * double 2^53 ceiling, overflow-free ratio rounding at 100×-scale cents
  * sums, and the VectorMean exactness precondition failing loudly.
  */
class QSpec extends SparkSpec {
  import spark.implicits._

  test("intDiv is exact above 2^53 (DECIMAL lift, r3 precision ceiling)") {
    // 2^53 + 5 is NOT representable as a double — the old double division
    // path would floor the wrong multiple.
    val p = (1L << 53) + 5L
    val cases = Seq((p, 3L), (p, 7L), (Long.MaxValue - 11, 13L))
    val out = cases.toDF("p", "q")
      .select(Q.intDiv($"p", $"q")).as[Long].collect()
    val expected = cases.map { case (pp, qq) => pp / qq } // exact long math
    assert(out.toSeq == expected)
  }

  test("round4Ratio survives cents sums whose 20000x multiple overflows LONG") {
    // p·20000 = 2·10^20 > Long.MaxValue — the old long multiply would wrap.
    val p = 10000000000000000L // 10^16 cents
    val q = 1000000000000L     // 10^12 rows
    val out = Seq((p, q)).toDF("p", "q")
      .select(Q.round4Ratio($"p", $"q")).as[Double].head()
    assert(out == 10000.0) // exact average 10^4, round4 → 10000.0000
    // and an inexact ratio for good measure: 10^16 / (3·10^12) = 3333.3333...
    val out2 = Seq((p, 3 * q)).toDF("p", "q")
      .select(Q.round4Ratio($"p", $"q")).as[Double].head()
    assert(out2 == 3333.3333)
  }

  test("round4Ratio half-up boundary unchanged by the DECIMAL lift") {
    // 1/8 = 0.125 → 4dp half-up → 0.125 stays 0.1250; 1/16 = 0.0625 →
    // 0.0625; 0.00005 boundary: 1/20000 → 0.0001 (half rounds up).
    val rows = Seq((1L, 8L, 0.125), (1L, 16L, 0.0625), (1L, 20000L, 0.0001))
    val out = rows.map(r => (r._1, r._2)).toDF("p", "q")
      .select(Q.round4Ratio($"p", $"q")).as[Double].collect().toSeq
    assert(out == rows.map(_._3))
  }

  test("VectorMean rejects components whose fixed-point encoding is lossy") {
    // 1e-7f · 2^45 ≈ 3518437.21 — not an integer; silent truncation would
    // desynchronize from the oracle, so reduce must throw.
    val df = Seq((0, Seq(1e-7f))).toDF("label", "embedding")
    val centroid = udaf(new VectorMean(1))
    val e = intercept[Exception] {
      df.groupBy($"label").agg(centroid($"embedding")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("not exactly representable"))))
  }
}
