package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryPack
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[graft.core.QueryPack]]. Each pack pairs its Spark
  * queries with DuckDB oracle SQL; the driver's Verify run hash-compares
  * the two on sf0.01.
  */
object SparkEntry {

  /** All registered packs, in display order. */
  def packs: Seq[QueryPack] = Seq(
    CorePack,
    RelationalPack,
    RelationalPack2,
    RelationalPack3,
    RelationalPack4,
    EventsPack,
    DedupPack,
    PipelinePack,
    SimilarityPack,
    TextPack,
    RetrievalPack,
    CleanPack,
    AnalyticsPack,
    MultimodalPack,
    graft.streaming.StreamingPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.documentsWordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
