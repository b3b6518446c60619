package graft.plans

import graft.operators.MatrixOps
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Logical matrix-multiply operator: `C = A · B` over COO children with
  * schema `(i, j, v)` (B read as B[j,k] — row = contraction index, exactly
  * [[MatrixOps.matmul]]'s convention). The node carries INTENT only; the
  * physical formulation — row-level join+aggregate vs 2-D block GEMM — is
  * chosen by [[MatMulStrategy]] at planning time from the children's cost
  * statistics. This replaces the caller-supplied `denseHint` of
  * [[MatrixOps.multiply]] with a planner decision, the way Spark itself
  * picks broadcast vs sort-merge joins (SURVEY §7's declared-optional
  * `extraStrategies` hook, r5 verdict item 9).
  *
  * `output` is a constructor parameter so the attribute ids survive
  * `copy()`/`transform` — parents resolve against these exact ids, and the
  * strategy re-aligns the expansion's output to them with a final Project.
  */
case class MatMul(left: LogicalPlan, right: LogicalPlan, blockSize: Int,
                  output: Seq[Attribute]) extends BinaryNode {
  // The output attributes are PRODUCED here, not passed through from the
  // children — without this, CheckAnalysis counts them as missing inputs
  // (MISSING_ATTRIBUTES) because they appear in this node's expression list.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  // And the node CONSUMES every child column (both COO triples): with the
  // default (empty) references, ColumnPruning decides no child column is
  // needed and rewrites the children to zero-column Projects, which the
  // strategy's expansion then fails to resolve against.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): MatMul =
    copy(left = newLeft, right = newRight)
}

object MatMul {
  /** Output schema is `(i, j, v)` — IDENTICAL to the COO child schema, so
    * MatMul nodes COMPOSE: a chain `(A·B)·C` is just nested nodes, which
    * is what lets [[MatMulReassociate]] rotate associations at the
    * logical level. Public entry points rename the column-index to `k`
    * for the user-facing result ([[graft.operators.MatrixOps
    * .multiplyPlanned]]).
    */
  def node(left: LogicalPlan, right: LogicalPlan, blockSize: Int): MatMul =
    MatMul(left, right, blockSize, Seq(
      AttributeReference("i", LongType)(),
      AttributeReference("j", LongType)(),
      AttributeReference("v", LongType)()))
}

/** Optimizer rule: reassociate LEFT-DEEP MatMul chains toward the cheaper
  * association — the matrix-chain-ordering decision, made from Catalyst
  * cost statistics the way join reorder is. Model: a MatMul's default
  * size estimate is the product of its children's (`BinaryNode` fallback),
  * under which the two associations of `(A·B)·C` share the `sA·sB·sC`
  * term and differ by `sA·sB` (left-deep) vs `sB·sC` (right-deep) — so
  * rotate right exactly when C is smaller than A (the small operand
  * belongs innermost, where it contracts the big ones early). Each
  * rotation strictly shortens the left spine, so the fixed-point batch
  * terminates; a rotated plan no longer matches the pattern. The top
  * node keeps its attribute ids (parents resolve against them); the new
  * inner node mints fresh ones.
  */
object MatMulReassociate
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case MatMul(MatMul(a, b, bsInner, _), c, bs, out)
        if c.stats.sizeInBytes < a.stats.sizeInBytes =>
      MatMul(a, MatMul.node(b, c, bsInner), bs, out)
  }
}

/** Plans [[MatMul]]: if either operand's estimated size fits the broadcast
  * threshold, the row-level join+aggregate wins (the join becomes a
  * broadcast hash join — no shuffle on the contraction index, and the
  * block path's two collect_list groupings + object serde would be pure
  * overhead). Otherwise both sides are big: the 2-D block GEMM path, whose
  * shuffle volume is O(tiles) of grouped rows rather than the dense row
  * join's |A⋈B| = m·n·p intermediate (the r3 scale-killer).
  *
  * The expansion reuses the DataFrame builders (one formulation, used by
  * both the planned and the handwritten entry points), analyzed into a
  * logical subtree handed back to the planner via `planLater`; a final
  * Project pins the expansion's output to the node's attribute ids.
  */
class MatMulStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MatMul =>
      val bcThreshold = spark.sessionState.conf.autoBroadcastJoinThreshold
      val minSide = m.left.stats.sizeInBytes.min(m.right.stats.sizeInBytes)
      val a = GraftSqlShim.ofRows(spark, m.left)
      val b = GraftSqlShim.ofRows(spark, m.right)
      val composed =
        if (bcThreshold > 0 && minSide <= bcThreshold) MatrixOps.matmul(a, b)
        else MatrixOps.blockMatmul(a, b,
          if (m.blockSize > 0) m.blockSize
          else MatMulStrategy.deriveBs(m.left, m.right))
      val expanded = composed.queryExecution.analyzed
      val aligned = Project(
        m.output.zip(expanded.output).map { case (target, src) =>
          Alias(src, target.name)(exprId = target.exprId)
        }, expanded)
      planLater(aligned) :: Nil
    case _ => Nil
  }
}

object MatMulStrategy {
  /** Last block-path tile decision `(nnz estimate, derived n, bs)` — a
    * planning-time observability hook for the plan specs (the chosen bs is
    * invisible in the physical plan string: it only parameterizes the
    * mapGroups closures). Written ONLY by [[deriveBs]].
    */
  @volatile var lastDerived: Option[(BigInt, Long, Int)] = None

  /** Planner-derived tile width (r11 VERDICT "Next round" 5): the measured
    * [[MatrixOps.sweepTile]] rule — bs = min(n/8, 512), the 8×8-grid
    * core-saturation floor under the r9-measured per-task memory cap —
    * applied to a dimension estimate FROM THE SAME COST STATISTICS the
    * strategy's broadcast decision reads, so the planner owns the whole
    * physical choice and callers stop shipping a magic 128. A dense n×n
    * COO child has n² rows; without CBO row counts the estimate is
    * sizeInBytes over the 32-byte (i, j, v) row footprint (3 longs + row
    * overhead — Catalyst's own size model for this schema). The estimate
    * only needs to land within a FACTOR of n: bs buckets are coarse
    * (⌈n/8⌉ below 4096, the 512 cap above) and both the floor and the cap
    * are safe on either side — a 2× low bs doubles grid parallelism at
    * identical task memory, a 2× high one stays under the measured 8
    * MB/task tile bound via the 512 cap.
    */
  def deriveBs(left: LogicalPlan, right: LogicalPlan): Int = {
    val rowBytes = 32
    val nnz = (left.stats.sizeInBytes.max(right.stats.sizeInBytes) /
      rowBytes).max(BigInt(1))
    val n = math.sqrt(nnz.min(BigInt(Long.MaxValue)).toDouble).toLong.max(1L)
    val bs = MatrixOps.sweepTile(math.min(n, Int.MaxValue).toInt)
    lastDerived = Some((nnz, n, bs))
    bs
  }
}
