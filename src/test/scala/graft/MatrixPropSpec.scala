package graft

import graft.operators.{MatrixGen, MatrixOps}
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based matrix algebra (SURVEY.md §5.2 item 2): the invariants
  * hold for ARBITRARY shapes and block sizes, not just the hand-picked
  * fixtures — in particular rectangular shapes with rows_A < cols_A, the
  * exact case the reference's reducer-loop bound gets wrong
  * (`/root/reference/reducer/main.py:30`).
  *
  * Raw ScalaCheck driven from ScalaTest (the scalatest–scalacheck bridge
  * artifact is not in the offline dependency set). Sizes stay small (each
  * case runs Spark jobs); values come from the deterministic MatrixGen
  * family, so failures reproduce exactly.
  */
class MatrixPropSpec extends SparkSpec {

  private def toSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val dims = Gen.choose(1L, 9L)

  private def check(prop: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  test("matmul == blockMatmul for all shapes and block sizes (incl. rows_A < cols_A)") {
    check(Prop.forAll(dims, dims, dims, Gen.choose(1, 6)) {
      (m: Long, n: Long, p: Long, bs: Int) =>
        val a = MatrixGen.matA(spark, m, n)
        val b = MatrixGen.matB(spark, n, p)
        toSet(MatrixOps.multiply(a, b)) == toSet(MatrixOps.blockMatmul(a, b, bs))
    }, cases = 8)
  }

  test("transpose(A·B) == transpose(B)·transpose(A) for all shapes") {
    check(Prop.forAll(dims, dims, dims) { (m: Long, n: Long, p: Long) =>
      val a = MatrixGen.matA(spark, m, n)
      val b = MatrixGen.matB(spark, n, p)
      // multiply labels the product's second index k; transpose is
      // defined on the canonical (i, j, v) COO schema.
      val ab = MatrixOps.multiply(a, b).withColumnRenamed("k", "j")
      toSet(MatrixOps.transpose(ab)) ==
        toSet(MatrixOps.multiply(MatrixOps.transpose(b), MatrixOps.transpose(a)))
    }, cases = 5)
  }
}
