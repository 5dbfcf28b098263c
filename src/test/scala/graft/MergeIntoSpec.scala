package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the graft-mem SupportsRowLevelOperations contract: SQL
  * `MERGE INTO` plans Spark's group-based rewrite (read the table,
  * compute carried + merged rows, write the survivor set back through
  * the operation's write as ONE atomic replace commit), UPDATE/INSERT/
  * carry-over land correctly, and q456's metadata-delete path is NOT
  * displaced by the new row-level capability. */
class MergeIntoSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.sources.GraftMemCatalog].getName)
    s
  }

  test("MERGE INTO updates matched keys, inserts new ones, carries the rest") {
    import spark.implicits._
    val tbl = s"merge_spec_${System.nanoTime()}"
    Seq(("a", 1L), ("b", 2L), ("c", 3L))
      .toDF("k", "v").write.format("graft-mem").option("table", tbl)
      .mode("append").save()
    Seq(("b", 20L), ("d", 40L)).toDF("k", "v")
      .createOrReplaceTempView("merge_spec_src")
    spark.sql(
      s"""MERGE INTO graftmem.$tbl t USING merge_spec_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val got = spark.read.format("graft-mem").option("table", tbl).load()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq(("a", 1L), ("b", 20L), ("c", 3L), ("d", 40L)))
    val commits = graft.sources.GraftMemStore.commitsOf(tbl)
    assert(commits.map(_.kind) === List("append", "overwrite"),
      s"merge must be ONE replace commit: $commits")
    assert(commits.last.filters === "replace_merge")
    assert(commits.last.deleted === 3 && commits.last.inserted === 4)
  }

  test("metadata delete still wins over the row-level path (q456 contract)") {
    import spark.implicits._
    val tbl = s"merge_spec_del_${System.nanoTime()}"
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    spark.sql(s"DELETE FROM graftmem.$tbl WHERE k = 'a'")
    val commits = graft.sources.GraftMemStore.commitsOf(tbl)
    assert(commits.map(_.kind) === List("append", "delete"),
      s"EqualTo delete must stay on the metadata path: $commits")
    val got = spark.read.format("graft-mem").option("table", tbl).load()
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("b"))
  }

  test("row-level UPDATE rewrites through the same replace commit") {
    import spark.implicits._
    val tbl = s"merge_spec_upd_${System.nanoTime()}"
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.format("graft-mem").option("table", tbl).mode("append").save()
    spark.sql(s"UPDATE graftmem.$tbl SET v = v * 10 WHERE k = 'a'")
    val got = spark.read.format("graft-mem").option("table", tbl).load()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq(("a", 10L), ("b", 2L)))
    val commits = graft.sources.GraftMemStore.commitsOf(tbl)
    assert(commits.last.kind === "overwrite" &&
      commits.last.filters === "replace_update", commits.toString)
  }
}
