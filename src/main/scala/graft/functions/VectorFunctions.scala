package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> columns as codegen-friendly higher-order
  * function compositions (SURVEY §2.2 P14-P16: the CLIP normalize / dot /
  * softmax path of `main.py:78-79`).
  *
  * Everything is computed in DOUBLE: float→double casts are exact, and both
  * engines (Spark HOF fold, DuckDB list_sum over list_transform) accumulate
  * left-to-right, so results are bit-identical for the oracle compare.
  *
  * HOFs keep the hot path inside whole-stage codegen; promote to custom
  * Catalyst `Expression`s only if the sf0.1 bench shows HOF overhead
  * (SURVEY §4 item 3).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² — self-dot without the zip. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2 norm (`main.py:38, 78` normalize denominator). */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Elementwise x / ‖a‖ — the reference's `norm()` division. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** cos(a,b) = a·b / (‖a‖·‖b‖) — the CLIP image·text similarity
    * (`main.py:79`). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Numerically-stable softmax: exp(x−max)/Σexp(x−max) (`main.py:79`). */
  def softmax(a: Column): Column = {
    val mx = array_max(a).cast("double")
    val denom = aggregate(a, lit(0.0), (acc, x) => acc + exp(x.cast("double") - mx))
    transform(a, x => exp(x.cast("double") - mx) / denom)
  }
}
