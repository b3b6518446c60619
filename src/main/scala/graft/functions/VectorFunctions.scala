package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions, built from codegen'd higher-order
  * built-ins (`zip_with`, `aggregate`, `transform`) — no Scala UDFs in the
  * hot path, so whole-stage codegen stays intact (SURVEY.md §2.2 L5/L6).
  *
  * Accumulation is a sequential fold in index order 0..n-1 (determinism
  * convention 3, FIXTURES.md §3). Inputs are `ARRAY<FLOAT>` columns; every
  * function casts to DOUBLE first.
  */
object VectorFunctions {

  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product Σ a[i]·b[i], folded in index order — the native codegen'd
    * [[VecDot]] expression (bit-identical result to the zip_with +
    * aggregate formulation it replaced; see VecDot scaladoc).
    */
  def dot(a: Column, b: Column): Column =
    call_function("vec_dot", asDouble(a), asDouble(b))

  /** Squared L2 norm: vec_dot(a, a) — identical fold to summing squares. */
  def normSq(a: Column): Column = {
    val ad = asDouble(a)
    call_function("vec_dot", ad, ad)
  }

  /** Cosine similarity, rounded to `scale` decimals (convention: 4). */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b))), scale)
}
