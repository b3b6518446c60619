package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k distinct values (the KMV / k-minimum-values sketch state) as a
  * typed `Aggregator` — the fourth mergeable-sketch family in the engine
  * (GK quantiles l13b, HLL r30, CMS l58, KMV here) and the second custom
  * UDAF after [[VectorMean]].
  *
  * KMV (Bar-Yossef et al. 2002 "Counting distinct elements in a data
  * stream"; Beyer et al. SIGMOD'07's unbiased (k−1)·M/h_k estimator): keep
  * the k smallest DISTINCT hash values seen; if the hashes are uniform on
  * [0, M), the k-th smallest h_k estimates density k/n ≈ h_k/M, so
  * n̂ = (k−1)·M/h_k. Unlike HLL it supports set EXPRESSIONS (the
  * intersection of two sketches is a sketch of the intersection), which is
  * why warehouse engines keep both.
  *
  * Scale posture: the buffer is a sorted distinct LONG array capped at k —
  * fixed size regardless of group cardinality, so partial aggregation
  * (map-side combine) works at any row count and `merge` is one O(k)
  * sorted-array union. `reduce` is O(1) for the overwhelming majority of
  * rows once the sketch saturates (reject v ≥ current max), O(k) arraycopy
  * on the rare insert — the classic KMV streaming cost. Determinism: the
  * state is a pure FUNCTION of the input SET (order-free, duplicate-free),
  * so the sketch — unlike a sample — is partitioning- and engine-
  * independent, which is what lets l62 hash-gate its full contents.
  *
  * Estimator contract (r14 ADVICE): the (k−1)·M div h_k estimator divides
  * by the k-th minimum, which a k=1 sketch saturated by hash value 0 makes
  * zero. The Aggregator itself permits any k ≥ 1 (the sketch state is
  * well-defined); every estimator APPLICATION in the engine (l62, l63,
  * s29's KmvMonitorProcessor) therefore guards h_k > 0 and falls back to
  * the sketch size — unreachable at the shipped k=256, never relied upon.
  */
class BottomK(k: Int)
    extends Aggregator[Long, BottomK.Buf, Seq[Long]] {
  require(k >= 1, s"k must be positive, got $k")

  override def zero: BottomK.Buf = BottomK.Buf(Array.emptyLongArray)

  override def reduce(b: BottomK.Buf, v: Long): BottomK.Buf = {
    val a = b.values
    val n = a.length
    if (n == k && v >= a(n - 1)) return b // saturated fast path
    val i = java.util.Arrays.binarySearch(a, v)
    if (i >= 0) return b // already present
    val ins = -i - 1
    val grown = if (n < k) new Array[Long](n + 1) else new Array[Long](k)
    java.lang.System.arraycopy(a, 0, grown, 0, ins)
    grown(ins) = v
    java.lang.System.arraycopy(a, ins, grown, ins + 1,
      grown.length - ins - 1)
    BottomK.Buf(grown)
  }

  override def merge(x: BottomK.Buf, y: BottomK.Buf): BottomK.Buf = {
    val a = x.values; val b = y.values
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i == a.length) { j += 1; b(j - 1) }
        else if (j == b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (b(j) < a(i)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // common value — dedup
      out(o) = take; o += 1
    }
    BottomK.Buf(if (o == out.length) out else out.take(o))
  }

  override def finish(b: BottomK.Buf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b.values)

  override def bufferEncoder: Encoder[BottomK.Buf] =
    Encoders.product[BottomK.Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BottomK {
  /** Sorted ascending, distinct, length ≤ k. */
  case class Buf(values: Array[Long])
}
