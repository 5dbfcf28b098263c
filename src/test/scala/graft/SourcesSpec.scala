package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Source/sink coverage beyond parquet: CSV, JSON and text write→read
  * round-trips must preserve content; binary columns survive a parquet
  * round-trip. (The reference's only format is plain text, SURVEY §2 O1;
  * these are the extended engine's formats.)
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("csv round-trip preserves documents metadata") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
    val path = tmp("csv")
    docs.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true")
      .schema(docs.schema) // explicit schema: csv is untyped
      .csv(path)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves documents incl. text column") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("json")
    docs.write.json(path)
    val back = spark.read.schema(docs.schema).json(path)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("text sink writes word count in reference output shape") {
    // O11/O12: "key count" lines, globally sorted
    val wc = graft.operators.WordCount.documentsWordCount(spark, dir)
      .select(concat_ws(" ", col("word"), col("cnt")).as("value"))
    val path = tmp("text")
    wc.coalesce(1).write.text(path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.length == 31)
    assert(lines.sameElements(lines.sorted), "output must stay key-sorted")
    assert(lines.forall(_.matches("\\S+ \\d+")))
  }

  test("orc round-trip preserves documents incl. text column") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("orc")
    docs.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("binary column survives a parquet round-trip") {
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val path = tmp("bin")
    bin.write.parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema("payload").dataType.typeName == "binary")
    val joined = back.as("b").join(bin.as("a"), "doc_id")
      .filter(md5(col("a.payload")) =!= md5(col("b.payload")))
    assert(joined.count() == 0)
  }
}
