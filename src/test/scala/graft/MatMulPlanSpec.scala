package graft

import graft.operators.{MatrixGen, MatrixOps}
import org.apache.spark.sql.DataFrame

/** The planner-selected MatMul node (SURVEY §7's extraStrategies hook):
  * MatMulStrategy must pick the row join when a side is broadcastable, the
  * block-GEMM path when broadcast is off the table, and both must equal the
  * handwritten formulations cell-for-cell.
  */
class MatMulPlanSpec extends SparkSpec {

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  private def planned() = MatrixOps.multiplyPlanned(
    MatrixGen.matA(spark, 40, 30), MatrixGen.matB(spark, 30, 20), bs = 16)

  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan.toString
  }

  test("small operands plan as the broadcast row join (no object serde)") {
    val df = planned()
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast row join:\n$plan")
    assert(!plan.contains("SerializeFromObject"),
           s"block GEMM chosen for broadcastable operands:\n$plan")
    assert(canon(df) == canon(MatrixOps.matmul(
      MatrixGen.matA(spark, 40, 30), MatrixGen.matB(spark, 30, 20))))
  }

  test("without broadcast the strategy switches to the block-GEMM path") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = planned()
      val plan = executedPlan(df)
      assert(plan.contains("SerializeFromObject"),
             s"expected the block-GEMM object pipeline:\n$plan")
      assert(canon(df) == canon(MatrixOps.blockMatmul(
        MatrixGen.matA(spark, 40, 30), MatrixGen.matB(spark, 30, 20), 16)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cost statistics flip the physical path across the m1 size sweep") {
    // Planning only (no execution): MatMulStrategy decides from the
    // children's size estimates, before AQE ever runs — so the choice is
    // visible in the initial physical plan string.
    def planFor(n: Int): String = MatrixOps.multiplyPlanned(
      MatrixGen.matA(spark, n, n), MatrixGen.matB(spark, n, n))
      .queryExecution.executedPlan.toString
    // 50²: COO estimate ~0.2 MB — a broadcastable side, row join.
    assert(!planFor(50).contains("SerializeFromObject"),
           "50² should plan as the broadcast row join")
    // 1000²/2000² (the bench's m1_sweep_1000/2000 rungs): estimates
    // (~64 MB / ~256 MB) clear the broadcast threshold on BOTH sides, so
    // the strategy flips to the block-GEMM object pipeline — the
    // dense-operand shape whose row join would shuffle m·n·p rows.
    assert(planFor(1000).contains("SerializeFromObject"),
           "1000² should plan as block GEMM")
    assert(planFor(2000).contains("SerializeFromObject"),
           "2000² should plan as block GEMM")
  }

  test("the planner derives the block tile width from operand statistics") {
    // bs = 0 (the multiplyPlanned default) hands the tile decision to
    // MatMulStrategy.deriveBs — the measured sweepTile rule (min(n/8, 512))
    // over the SAME size statistics the broadcast decision reads. The
    // chosen bs is invisible in the plan string (it parameterizes the
    // mapGroups closures), so the strategy records its last derivation.
    // The pinned values encode Catalyst's size model for the crossJoin-of-
    // ranges COO children (nnz ≈ sizeInBytes/32 ⇒ n within ~2× of true n;
    // both the n/8 floor and the 512 cap are safe on either side of that
    // factor) — if the size model shifts across Spark versions, this spec
    // is MEANT to flag it.
    import graft.plans.MatMulStrategy
    def derivedFor(n: Int): (Long, Int) = {
      MatMulStrategy.lastDerived = None
      // Planning only: executedPlan forces strategy application, no run.
      MatrixOps.multiplyPlanned(
        MatrixGen.matA(spark, n, n), MatrixGen.matB(spark, n, n))
        .queryExecution.executedPlan
      val Some((_, nEst, bs)) = MatMulStrategy.lastDerived
      (nEst, bs)
    }
    val (n1, bs1) = derivedFor(1000)
    val (n2, bs2) = derivedFor(8000)
    // 1000²: the n/8 regime — bs tracks the dimension estimate.
    assert(bs1 == MatrixOps.sweepTile(n1.toInt) && bs1 < 512 && bs1 >= 125,
      s"1000² derived (n=$n1, bs=$bs1)")
    // 8000²: the measured memory cap — bs clamps at 512 however large the
    // operands get (per-task tile memory stays O(512²); the GRID widens).
    assert(bs2 == 512, s"8000² derived (n=$n2, bs=$bs2)")
    // An explicit bs still wins (the probe ladders' A/B switch): no
    // derivation is recorded when the caller pins it.
    MatMulStrategy.lastDerived = None
    MatrixOps.multiplyPlanned(
      MatrixGen.matA(spark, 1000, 1000), MatrixGen.matB(spark, 1000, 1000),
      bs = 64).queryExecution.executedPlan
    assert(MatMulStrategy.lastDerived.isEmpty, "explicit bs must not derive")
  }

  test("MatMulReassociate rotates (A·B)·C right-deep iff C is the small operand") {
    import graft.plans.MatMul
    val a = MatrixGen.matA(spark, 40, 30)
    val b = MatrixGen.matB(spark, 30, 30)
    def topNode(df: DataFrame): MatMul =
      df.queryExecution.optimizedPlan.collectFirst { case m: MatMul => m }.get

    // C tiny (30×2): the rule must rotate — right child becomes the inner
    // MatMul, left child is a base operand.
    val cSmall = MatrixGen.matB(spark, 30, 2)
    val rotated = topNode(MatrixOps.multiplyPlannedChain(a, b, cSmall, 16))
    assert(rotated.right.isInstanceOf[MatMul] && !rotated.left.isInstanceOf[MatMul],
           s"expected right-deep rotation:\n$rotated")
    // C big (30×200): left-deep is already the cheap association — no
    // rotation.
    val cBig = MatrixGen.matB(spark, 30, 200)
    val kept = topNode(MatrixOps.multiplyPlannedChain(a, b, cBig, 16))
    assert(kept.left.isInstanceOf[MatMul] && !kept.right.isInstanceOf[MatMul],
           s"expected left-deep chain kept:\n$kept")
    // Both associations are result-identical to the handwritten chain.
    val want = canon(MatrixOps.matmul(
      MatrixOps.matmul(a, b).withColumnRenamed("k", "j"), cSmall))
    assert(canon(MatrixOps.multiplyPlannedChain(a, b, cSmall, 16)) == want)
  }

  test("downstream operators compose over the MatMul node's output") {
    import org.apache.spark.sql.functions._
    // Filter + aggregate ABOVE the custom node: parent expressions resolve
    // against the node's attribute ids, which the strategy's final Project
    // must preserve through the expansion.
    val total = planned().filter(col("i") < 10L).agg(sum(col("v")))
      .head().getLong(0)
    val expected = MatrixOps.matmul(
        MatrixGen.matA(spark, 40, 30), MatrixGen.matB(spark, 30, 20))
      .filter(col("i") < 10L).agg(sum(col("v"))).head().getLong(0)
    assert(total == expected && total > 0L)
  }
}
