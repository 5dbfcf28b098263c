package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** V2 FunctionCatalog surface (the seventh public Catalyst extension
  * doorway this engine exercises, after codegen Expressions, native
  * aggregates, a SparkStrategy, an optimizer Rule, the DSv2 read/write
  * connector, and a TableCatalog): the Hilbert xy2d kernel registered
  * as a catalog SCALAR FUNCTION, so plain SQL text resolves it through
  * `graftmem.hilbert2(x, y)` — no Column-API helper, no session
  * extension injection. This is how a lakehouse catalog (Iceberg's
  * `system` functions are the canonical case) ships engine-side
  * functions to every SQL client.
  *
  * The bound function supplies the MAGIC invoke method
  * (`invoke(Long, Long): Long`) — Spark's analyzer rewrites the call to
  * a direct `Invoke` on this object, codegen-friendly and allocation-
  * free — with `produceResult` kept as the specified interpreted
  * fallback. Both delegate to the SAME kernel the codegen Expression
  * uses ([[graft.functions.HilbertIndex2.xy2d]]), so the q444 layout
  * lane and the catalog lane (q464) cannot drift apart.
  */
class GraftHilbertUnbound extends UnboundFunction {
  override def name(): String = "hilbert2"
  override def description(): String =
    "hilbert2(x, y): order-8 Hilbert curve index of an 8-bit cell pair"
  override def bind(inputType: StructType): BoundFunction = {
    // the UnboundFunction contract wants UnsupportedOperationException on
    // a type mismatch, so the analyzer reports a proper cannot-apply
    // error instead of an internal-looking IllegalArgumentException
    if (inputType.fields.length != 2 ||
        !inputType.fields.forall(_.dataType == LongType))
      throw new UnsupportedOperationException(
        s"hilbert2 expects (BIGINT, BIGINT), got $inputType")
    new GraftHilbertFunction
  }
}

class GraftHilbertFunction extends ScalarFunction[java.lang.Long] {
  override def name(): String = "hilbert2"
  override def canonicalName(): String = "graft.hilbert2"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  /** Magic-method path: resolved statically by the analyzer, invoked
    * directly per row (no InternalRow boxing). */
  def invoke(x: Long, y: Long): Long =
    graft.functions.HilbertIndex2.xy2d(x, y)

  /** Specified interpreted fallback. */
  override def produceResult(input: InternalRow): java.lang.Long =
    graft.functions.HilbertIndex2.xy2d(input.getLong(0), input.getLong(1))
}
