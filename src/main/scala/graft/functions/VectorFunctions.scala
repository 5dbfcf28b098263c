package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, engine-portable vector arithmetic over `array<float>` embeddings.
  *
  * Why not plain double math: float aggregation order differs between
  * engines/partitionings, and float→DECIMAL casts round ties differently
  * (Spark half-up vs DuckDB half-even — verified divergence on
  * 0.0009765625f). Instead every component is quantized ONCE to int64
  * fixed-point at 1e-6 resolution via `floor(x * 1e6)` — float→double is
  * exact and the double multiply+floor is bit-identical IEEE-754 in both
  * engines — and all inner products are computed exactly in int64, so
  * they are independent of aggregation order and identical across
  * engines.
  *
  * The 1e-6 scale is chosen so a 64-dim dot product of unit-ish vectors
  * is ≤ ~1e13 < 2^53, i.e. the exact integer also converts to double
  * EXACTLY — at 1e-9 scale the (exact) integer dot exceeded 2^53 and the
  * int→double rounding differed between engines in the last ulp
  * (observed live on one q51 pair). Quantization error on unit vectors
  * perturbs cosines by ~1e-6 — far below every thresholding margin here.
  *
  * Scale: quantization is a per-row `transform` (narrow); products are
  * plain int64 multiplies.
  */
object VectorFunctions {

  /** Fixed-point scale: components ×1e6 → int64. */
  val Scale = 1e6
  /** Divisor restoring an unscaled dot product: Scale². */
  val DotDivisor = 1e12

  /** int64 fixed-point quantization at 1e-6: array<float> → array<bigint>. */
  def quantize(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(Scale)).cast("long"))

  /** Exact dot product of two quantized vectors, as the true (unscaled)
    * double value: int64 sum of products (exact, fits 2^53), one double
    * division. Uses the native codegen [[LongArrayDot]] kernel — callers
    * must have run [[GraftExpressions.ensure]] on the session.
    */
  def dotQ(qa: Column, qb: Column): Column =
    GraftExpressions.longArrayDot(qa, qb).cast("double") / lit(DotDivisor)

  /** Exact squared norm (unscaled double) of a quantized vector. */
  def normSqQ(q: Column): Column = dotQ(q, q)

  /** Cosine similarity from pre-computed quantized vectors and norms. */
  def cosineQ(qa: Column, qb: Column, normA: Column, normB: Column): Column =
    dotQ(qa, qb) / (normA * normB)

  /** The DuckDB-side mirror of [[quantize]] (applied to a list column). */
  def quantizeSql(col: String): String =
    s"list_transform($col, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** DuckDB-side exact dot of two quantized list columns (unscaled double).
    * Correlated subquery form; `dim` is the vector dimensionality.
    */
  def dotQSql(qa: String, qb: String, dim: Int): String =
    s"""(CAST((SELECT SUM($qa[g.i] * $qb[g.i])
       |       FROM UNNEST(generate_series(1, $dim)) AS g(i)) AS DOUBLE) / 1e12)""".stripMargin
}
