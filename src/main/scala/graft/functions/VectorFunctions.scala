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

  private def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product Σ a[i]·b[i], folded in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, rounded to `scale` decimals (convention: 4). */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b))), scale)
}
