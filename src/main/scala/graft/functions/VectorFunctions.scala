package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, engine-portable vector arithmetic over `array<float>` embeddings.
  *
  * Why not plain double math: float aggregation order differs between
  * engines/partitionings, and float→DECIMAL casts round ties differently
  * (Spark half-up vs DuckDB half-even — verified divergence on
  * 0.0009765625f). Instead every component is quantized ONCE to int64
  * fixed-point at 1e-9 resolution via `floor(x * 1e9)` — float→double is
  * exact and the double multiply+floor is bit-identical IEEE-754 in both
  * engines — and all inner products are computed exactly in
  * integer/decimal space, so they are independent of aggregation order and
  * identical across engines. Final cosines are derived with a fixed
  * sequence of IEEE double ops.
  *
  * Scale: quantization is a per-row `transform` (narrow, codegen'd); the
  * exact products stay inside whole-stage codegen. The 1e-9 quantization
  * error on unit-norm vectors perturbs cosines by <1e-7 — far below any
  * thresholding margin used here.
  */
object VectorFunctions {

  /** int64 fixed-point quantization at 1e-9: array<float> → array<bigint>. */
  def quantize(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(1e9)).cast("long"))

  /** Exact dot product of two quantized vectors, as the true (unscaled)
    * double value: sum of int64×int64 products in DECIMAL(38,0), then one
    * double division by 1e18.
    */
  def dotQ(qa: Column, qb: Column): Column =
    aggregate(
      zip_with(qa, qb, (x, y) => x.cast("decimal(19,0)") * y.cast("decimal(19,0)")),
      lit(0).cast("decimal(38,0)"),
      (acc, v) => acc + v
    ).cast("double") / lit(1e18)

  /** Exact squared norm (unscaled double) of a quantized vector. */
  def normSqQ(q: Column): Column = dotQ(q, q)

  /** Cosine similarity from pre-computed quantized vectors and norms. */
  def cosineQ(qa: Column, qb: Column, normA: Column, normB: Column): Column =
    dotQ(qa, qb) / (normA * normB)

  /** The DuckDB-side mirror of [[quantize]] (applied to a list column). */
  def quantizeSql(col: String): String =
    s"list_transform($col, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000000) AS BIGINT))"

  /** DuckDB-side exact dot of two quantized list columns (unscaled double).
    * Correlated subquery form; `dim` is the vector dimensionality.
    */
  def dotQSql(qa: String, qb: String, dim: Int): String =
    s"""(CAST((SELECT SUM(CAST($qa[g.i] AS DECIMAL(19,0)) * CAST($qb[g.i] AS DECIMAL(19,0)))
       |       FROM UNNEST(generate_series(1, $dim)) AS g(i)) AS DOUBLE) / 1e18)""".stripMargin
}
