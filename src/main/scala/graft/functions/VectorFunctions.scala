package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (no UDFs in the hot path — SURVEY.md §2 Part B
  * "similarity search").
  *
  * All accumulation is done in double, folding left-to-right over the array
  * (`aggregate` is a sequential fold), which keeps results bit-stable across
  * engines: the DuckDB oracle casts to DOUBLE[] and folds in the same order.
  */
object VectorFunctions {

  /** dot(a, b) in double precision — fused codegen expression
    * (FloatVecDot); same sequential fold as the HOF formulation
    * `aggregate(zip_with(...))`, ~10x faster (no per-row array allocation,
    * stays inside whole-stage codegen). */
  def dotProduct(a: Column, b: Column): Column = VecExpressions.vecDot(a, b)

  /** dot(a, b) via higher-order functions — kept as the reference
    * implementation (bit-identical to dotProduct). */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm in double precision. */
  def l2Norm(a: Column): Column = sqrt(VecExpressions.vecDot(a, a))

  /** cosine(a, b) = dot / (|a| * |b|) — the same association DuckDB's
    * list_cosine_similarity uses, for oracle parity. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance in double precision. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
