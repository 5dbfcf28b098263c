package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants for every registered query: runs on sf0.001,
  * returns rows, has a stable schema (no auto-generated column names —
  * those would break the driver's column-name hash-match), and the oracle
  * map only references registered queries.
  *
  * Deep correctness is the DuckDB oracle gate (scripts/verify_local.sh);
  * this spec is the fast structural guard.
  */
class QueryRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("no query-name collisions across packs (toMap would silently drop)") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    val dupes = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Output-type canonicalization policy (r6 judge finding, the
    * q170/q196 class): every OUTPUT column must be a type whose arrow
    * rendering is canonical across engines — never engine-inferred
    * DECIMAL (DuckDB window/`sum` promotes to DECIMAL(38,0)/HUGEINT
    * where Spark stays BIGINT; the driver's hash is type-sensitive).
    * DECIMAL stays internal to a query; cast before the final select.
    */
  private def typeOk(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case LongType | IntegerType | DoubleType | StringType | BooleanType |
           TimestampType | TimestampNTZType | DateType | BinaryType => true
      case ArrayType(e, _) => typeOk(e)
      case _ => false
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001 with clean schema") {
      val df = fn(spark, sfDir)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns: ${cols.mkString(",")}")
      val ugly = cols.filter(c => c.contains("(") || c.contains(" ") || c.contains("AS "))
      assert(ugly.isEmpty, s"unaliased computed columns: ${ugly.mkString(",")}")
      val badTypes = df.schema.fields.filterNot(f => typeOk(f.dataType))
        .map(f => s"${f.name}: ${f.dataType.simpleString}")
      assert(badTypes.isEmpty,
        s"non-canonical output types (cast in the final select): ${badTypes.mkString(", ")}")
      assert(df.count() >= 0) // materializes the whole plan
    }
  }
}
