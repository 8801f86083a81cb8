package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector operations over `array<float>` embedding columns (SURVEY.md
  * §2.3 similarity search; dask.array analog per SURVEY §1.2).
  *
  * All folds are sequential left-to-right in double precision, which makes
  * results bit-identical to the DuckDB oracle's list-comprehension fold —
  * the parity contract for every cosine-based query. (DuckDB's native
  * `list_cosine_similarity` computes in float32 and does NOT match.)
  *
  * These are composed from higher-order functions; ArrayAggregate is not
  * whole-stage-codegen'd, so the hot brute-force path has a codegen
  * upgrade available in graft.functions.DotProduct (same fold
  * order, same bits).
  *
  * Tier C north-star extension (SURVEY §2.3 similarity search).
  */
object VectorOps {

  /** Σ aᵢbᵢ as a sequential double fold — codegen'd Expression (see
    * DotProduct); identical bits to the HOF fold it replaced. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** The original higher-order-function formulation (kept for the HOF
    * surface inventory and as the parity cross-check in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)

  /** ‖a‖₂ as a sequential double fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity from a precomputed-norm pair (norms should be
    * computed once per vector, not once per pair). */
  def cosineFromNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Direct cosine similarity (convenience for small inputs). */
  def cosine(a: Column, b: Column): Column =
    cosineFromNorms(dot(a, b), norm(a), norm(b))

  /** DuckDB SQL fragment computing the same sequential double fold:
    * dot(aExpr, bExpr) over `dim` components. */
  def duckDot(aExpr: String, bExpr: String, dim: Int = 64): String =
    s"list_sum([CAST($aExpr[i] AS DOUBLE) * $bExpr[i] FOR i IN range(1, ${dim + 1})])"

  def duckNorm(aExpr: String, dim: Int = 64): String =
    s"sqrt(${duckDot(aExpr, aExpr, dim)})"
}
