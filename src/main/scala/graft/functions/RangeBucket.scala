package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, Expression, NullOrdering, RowOrdering, SortDirection,
  SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range-bucket assignment against a FIXED, driver-computed boundary list:
  * `bucket(row) = |{ b ∈ boundaries : b ≤ key(row) }|` under the sort
  * order given by `specs` (per-field direction + null ordering, the same
  * ordering semantics as Spark's `SortOrder`). Boundaries are carried as a
  * literal payload (tiny — P−1 keys regardless of data volume) and looked
  * up by BINARY SEARCH, so the per-row cost is O(log P) comparisons — the
  * same per-row work `repartitionByRange`'s shuffle writer does, but from
  * boundaries that are pinned constants instead of a fresh nondeterministic
  * sample per exchange execution.
  *
  * Why this exists (the round-13 `weak`): [[graft.operators.OrderOps]]
  * feeds one ranged frame to two consumers (a partition-count aggregate
  * and a per-partition rank window). With `repartitionByRange`, each
  * consumer may RE-SAMPLE different boundaries, detaching the offsets from
  * the partitions they measure — pinning that with an eager
  * `localCheckpoint` costs a full second copy of the corpus on
  * non-replicated executor-local storage, and one lost executor kills the
  * job (checkpoint truncates lineage). Making the bucket id a PURE
  * FUNCTION of the row (this expression) removes the nondeterminism at the
  * source: every consumer computes the identical bucket from the same
  * broadcast constants, nothing is materialized, and lineage stays intact
  * for fault recovery.
  *
  * The comparison itself delegates to a `LazilyGeneratedOrdering` over
  * bound references — Spark's own codegen'd row ordering (serializable:
  * it ships its SortOrder spec and regenerates on the executor), so every
  * orderable type, direction, and null-ordering combination behaves
  * exactly as the equivalent `ORDER BY`. `eval` and the generated code
  * share one ordering instance via a codegen reference object; the
  * generated binary search stays inside whole-stage codegen.
  *
  * No counterpart in the reference (its only partitioner is the
  * round-robin HTTP fan-out, `orchestrator/main.py:84-146`).
  */
case class RangeBucket(
    keys: Seq[Expression],
    specs: Seq[(SortDirection, NullOrdering)],
    boundaries: Array[InternalRow])
  extends Expression {

  require(keys.nonEmpty && keys.length == specs.length,
    s"range_bucket: ${keys.length} keys vs ${specs.length} sort specs")

  override def children: Seq[Expression] = keys
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = keys.filterNot(k => RowOrdering.isOrderable(k.dataType))
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"range_bucket keys must be orderable, got ${bad.map(_.dataType.simpleString).mkString(", ")}")
  }

  /** Ordering over assembled key rows; field i of both sides is key i.
    * `LazilyGeneratedOrdering` (not the raw generated class) because the
    * instance rides the codegen reference array into task closures — it
    * serializes its SortOrder spec and regenerates on the executor.
    */
  @transient private lazy val ord: LazilyGeneratedOrdering =
    new LazilyGeneratedOrdering(
      keys.zip(specs).zipWithIndex.map { case ((k, (dir, no)), i) =>
        SortOrder(BoundReference(i, k.dataType, nullable = true), dir, no, Seq.empty)
      })

  /** Shared by eval and codegen: #boundaries ≤ key, by binary search. */
  private def search(key: InternalRow): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(boundaries(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { vals(i) = keys(i).eval(input); i += 1 }
    search(new GenericInternalRow(vals))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ordRef = ctx.addReferenceObj("rbOrd", ord,
      classOf[LazilyGeneratedOrdering].getName)
    val bndRef = ctx.addReferenceObj("rbBnds", boundaries,
      "org.apache.spark.sql.catalyst.InternalRow[]")
    val vals = ctx.freshName("rbVals")
    val keyRow = ctx.freshName("rbKey")
    val lo = ctx.freshName("rbLo")
    val hi = ctx.freshName("rbHi")
    val mid = ctx.freshName("rbMid")
    val evals = keys.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      // Explicit boxing — Janino's autoboxing in cast position is spotty.
      val boxed =
        if (CodeGenerator.isPrimitiveType(keys(i).dataType))
          s"${CodeGenerator.boxedType(keys(i).dataType)}.valueOf(${e.value})"
        else s"${e.value}"
      s"""${e.code}
         |if (${e.isNull}) { $vals[$i] = null; } else { $vals[$i] = $boxed; }
       """.stripMargin
    }.mkString("\n")
    val code =
      code"""
        Object[] $vals = new Object[${keys.length}];
        $fill
        org.apache.spark.sql.catalyst.InternalRow $keyRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
        int $lo = 0;
        int $hi = $bndRef.length;
        while ($lo < $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($ordRef.compare($bndRef[$mid], $keyRow) <= 0) { $lo = $mid + 1; } else { $hi = $mid; }
        }
        int ${ev.value} = $lo;
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keys = newChildren)
}
