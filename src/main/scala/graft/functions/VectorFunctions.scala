package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely
  * from higher-order functions (`zip_with`/`aggregate`/`transform`) so
  * every operation stays inside whole-stage codegen — no UDF, no
  * serialization boundary, scales as pure per-row CPU on 1000
  * executors.
  *
  * Two families:
  *   - `dot`/`norm`/`cosine` — double-precision, for specs and
  *     engine-internal use.
  *   - `quantize` + `dotQ`/`cosineQ` — fixed-point (×1000, floored)
  *     integer arithmetic. Integer sums are order-insensitive and
  *     engine-exact, so quantized cosine is bit-identical between
  *     Spark and the DuckDB oracle (SURVEY.md §3): thresholds can
  *     never flip across engines.
  */
object VectorFunctions {

  /** Fixed-point quantization: float → floor(x * scale) as long. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — native
    * codegen'd [[graft.functions.ArrayDotLong]] (HOF folds are
    * interpreted; this is the per-pair hot path). */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(ArrayDotLong(
      org.apache.spark.sql.GraftShim.expression(a),
      org.apache.spark.sql.GraftShim.expression(b)))

  /** Exact integer squared L2 norm of a quantized vector. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Quantized cosine similarity — deterministic across engines:
    * exact-integer dot and norms, one double division at the end.
    * (Operators precompute `normSqQ` per vector and divide by the
    * product instead — use this form only for ad-hoc pairs.) */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / sqrt((normSqQ(a) * normSqQ(b)).cast("double"))

  /** Double-precision dot product (sequential left fold, array order). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Double-precision L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Double-precision cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
