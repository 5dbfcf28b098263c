package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}

/** Reference-parity queries: word count both as the declarative DataFrame
  * pipeline and through the generic MapReduce facade (two independent
  * implementations, one oracle — they must agree).
  */
object CorePack extends QueryPack {

  private val wcOracle =
    """SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(string_split_regex(regexp_replace(text, '[^\w\s]', '', 'g'), '\s+')) AS w
      |      FROM documents)
      |WHERE w <> ''
      |GROUP BY w
      |ORDER BY word""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_wordcount" -> ((s, dir) => WordCount.documentsWordCount(s, dir)),

    // Same computation driven through the generic MapReduce facade
    // (flatMap → shuffle → mapGroups), i.e. the reference's programming
    // model verbatim. Result cast to the same schema as q00.
    "q01_mapreduce_wc" -> { (s, dir) =>
      import s.implicits._
      val lines = Tables.documents(s, dir).select("text").as[String]
      MapReduceJob.run(s, lines,
        MapReduceJob.wordCountMap,
        MapReduceJob.wordCountReduce,
        numPartitions = s.sessionState.conf.numShufflePartitions)
        .toDF("word", "cnt_s")
        .select(col("word"), col("cnt_s").cast("bigint").as("cnt"))
        .orderBy("word")
    }
  )

  override def oracle: Map[String, String] = Map(
    "q00_wordcount" -> wcOracle,
    "q01_mapreduce_wc" -> wcOracle
  )
}
