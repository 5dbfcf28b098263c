package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed without ever materializing them on the
  * driver.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic STUB ([[FakeDecoder.decode]]); everything
  * around it — the binary column, schema, partition-parallel batch
  * processing (`mapPartitions`), metadata/frame extraction as native
  * binary expressions — is the real pipeline shape. The driver corpus has
  * no binary column, so payloads are derived from `documents.text`
  * (UTF-8 bytes), which also makes the metadata DuckDB-checkable.
  *
  * Scale: all three queries are narrow per-row transforms over the scan
  * (plus the final sort); frames explode ~n_bytes/32 rows per doc but
  * stay partition-local until the sort.
  */
object MultimodalPack extends QueryPack {

  /** Media row: id + opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Fake "decoded image": dimensions/stats derived deterministically
    * from the payload header so tests and oracles can check the plumbing.
    */
  case class DecodedMeta(doc_id: Long, width: Int, height: Int,
                         channels: Int, mean_byte: Double)

  /** STUB decoder — stands in for a real image/audio codec (libjpeg,
    * ffmpeg, …), which this container does not ship. Deterministic on
    * the payload so the pipeline around it is testable. A real
    * deployment swaps only this function (same batch-per-partition call
    * shape).
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val head = payload.take(16).map(_ & 0xff)
      val mean = if (head.isEmpty) 0.0 else head.sum.toDouble / head.length
      (1 + b0 % 64, 1 + b1 % 64, 3, mean)
    }
  }

  /** The opaque-binary Dataset path: batch "decode" per partition. */
  def decodeAll(s: SparkSession, d: String): Dataset[DecodedMeta] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              lit("text/plain").as("media_type"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // one batch per partition — where a real decoder would be called
        // with its own thread/native context
        rows.map { r =>
          val (w, h, c, m) = FakeDecoder.decode(r.payload)
          DecodedMeta(r.doc_id, w, h, c, m)
        }
      }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- binary column + typed metadata via native expressions ----
    "q70_multimodal_meta" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("bigint").as("n_bytes"),
          md5(col("payload")).as("checksum"),
          lower(hex(expr("substr(payload, 1, 4)"))).as("header_hex"),
          expr("(length(payload) + 31) div 32").cast("bigint").as("n_frames"))
        .orderBy("doc_id")
    },

    // ---- frame sampling: every 4th 32-byte frame, hashed ----
    "q71_frame_sample" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .withColumn("n_frames", expr("(length(payload) + 31) div 32"))
        .select(col("doc_id"), col("payload"),
                explode(expr("filter(sequence(0, cast(n_frames - 1 as int)), i -> i % 4 = 0)")).as("frame_no"))
        .select(col("doc_id"), col("frame_no").cast("bigint").as("frame_no"),
                md5(expr("substr(payload, frame_no * 32 + 1, 32)")).as("frame_md5"))
        .orderBy("doc_id", "frame_no")
    },

    // ---- stubbed decode through the opaque mapPartitions path ----
    "q72_decode_stub" -> { (s, d) =>
      decodeAll(s, d).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
                col("mean_byte"))
        .orderBy("doc_id")
    },

    // ---- perceptual-hash near-dup on the BINARY modality: a 64-bit
    // pHash per payload (simhash votes over its 32-char frames — the
    // same portable vote/band machinery as q42, with frames as the
    // tokens; a real deployment swaps the frame slicer for a codec's
    // block/DCT features, the banded join is unchanged), then the
    // emit-once 5-band self-join on int64 band keys and a Hamming<=4
    // verify. 5 bands > threshold 4 ⇒ every qualifying pair is a
    // candidate by pigeonhole (q42's guarantee, BandingGuaranteeSpec).
    // Candidates only ever come from band equi-joins. ----
    "q74_phash_neardup" -> { (s, d) =>
      // frame count and slicing both use CHARACTER length: counting bytes
      // while slicing chars would mint empty trailing "frames" on
      // multibyte docs (identical on the ASCII corpus either way)
      val sims = warmed(Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          expr("(length(text) + 31) div 32").as("n_frames"))
        .select(col("doc_id"),
          explode(expr("sequence(0, cast(n_frames - 1 as int))")).as("i"), col("text"))
        .select(col("doc_id"), expr("substr(text, cast(i * 32 + 1 as int), 32)").as("w"))
        .selectExpr(Seq("doc_id") ++ DedupPack.nibbleExprs("instr"): _*)
        .groupBy("doc_id")
        .agg(expr(DedupPack.voteExprs("div").head),
          DedupPack.voteExprs("div").tail.map(expr): _*)
        .selectExpr(Seq("doc_id", s"${DedupPack.simhashExpr} AS phash") ++
          DedupPack.bandValExprs: _*))
      val bandCols = (0 until DedupPack.simhashBands).map(k => col(s"v$k"))
      val bands = sims
        .select(Seq(col("doc_id"), col("phash")) ++ bandCols :+
          posexplode(array(bandCols: _*)): _*)
        .toDF(Seq("doc_id", "phash") ++
          (0 until DedupPack.simhashBands).map(k => s"v$k") ++
          Seq("band_id", "band_val"): _*)
        .withColumn("bk", graft.functions.TextFunctions.hex64(md5(concat_ws(":",
          col("band_id").cast("string"), col("band_val").cast("string")))))
      // band_val alongside bk — free (both sides carry it) and keeps the
      // emit-once exactness independent of 60-bit key-collision odds
      // (mirrors q42, DedupPack)
      val result = bands.as("a").join(bands.as("b"),
          col("a.bk") === col("b.bk") &&
          col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id") && DedupPack.emitOnceCond)
        .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
                col("a.phash").as("phash_i"), col("b.phash").as("phash_j"))
        .withColumn("hamming", expr("bit_count(phash_i ^ phash_j)"))
        .filter(col("hamming") <= 4)
      materialized(result, sims).orderBy("doc_i", "doc_j")
    },

    // ---- stubbed resize: halved target dims + 8x strided byte
    // subsample as the "resized payload" (a real pipeline swaps the
    // stride sample for a codec's scaler; dims/stride plumbing, batch
    // shape and output checksum stay identical) ----
    "q73_resize_stub" -> { (s, d) =>
      // empty payloads resize to NULL on both sides: without the branch,
      // Spark's sequence(1, 0, 8) throws (positive step, start > stop)
      // where DuckDB's generate_series is empty, and ascii('') also
      // differs — so one empty document would crash the query. The inner
      // greatest(length, 1) keeps sequence() total even though the
      // branch makes it unreachable for empty text.
      val empty = length(col("text")) === 0
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(empty, lit(null)).otherwise(
            greatest(expr("(1 + ascii(substr(text, 1, 1)) % 64) div 2"), lit(1)))
            .cast("int").as("out_w"),
          when(empty, lit(null)).otherwise(
            greatest(expr("(1 + ascii(substr(text, 2, 1)) % 64) div 2"), lit(1)))
            .cast("int").as("out_h"),
          expr("(length(text) + 7) div 8").cast("bigint").as("n_sampled"),
          when(empty, lit(null).cast("string")).otherwise(md5(expr(
            "array_join(transform(sequence(1, greatest(length(text), 1), 8), i -> substr(text, i, 1)), '')")))
            .as("resized_md5"))
        .orderBy("doc_id")
    }
  )

  override def oracle: Map[String, String] = Map(
    "q70_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  lower(hex(substr(text, 1, 4))) AS header_hex,
        |  CAST((octet_length(encode(text)) + 31) // 32 AS BIGINT) AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q71_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |         (octet_length(encode(text)) + 31) // 32 AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(g.i AS BIGINT) AS frame_no,
        |       md5(substr(text, CAST(g.i * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM f, UNNEST(generate_series(0, CAST(n_frames - 1 AS INT))) AS g(i)
        |WHERE g.i % 4 = 0
        |ORDER BY doc_id, frame_no""".stripMargin,

    // stub decode: the fake decoder's arithmetic is deterministic on the
    // UTF-8 payload, so even the stub path is oracle-checkable (ASCII text:
    // byte i == ascii(char i+1))
    "q72_decode_stub" ->
      """SELECT doc_id,
        |  CAST(1 + ascii(substr(text, 1, 1)) % 64 AS INT) AS width,
        |  CAST(1 + ascii(substr(text, 2, 1)) % 64 AS INT) AS height,
        |  3 AS channels,
        |  (SELECT SUM(ascii(substr(text, g.i, 1)))
        |   FROM UNNEST(generate_series(1, least(length(text), 16))) AS g(i))
        |    / CAST(least(length(text), 16) AS DOUBLE) AS mean_byte
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // frames-as-tokens simhash, mirrored from q42's 64-bit 5-band
    // construction (shared generators — the two oracles cannot drift)
    "q74_phash_neardup" -> {
      val nibbles = DedupPack.nibbleExprs("strpos").mkString(", ")
      val votes = DedupPack.voteExprs("//").mkString(", ")
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
         |fr AS (SELECT doc_id, substr(text, CAST(g.i * 32 + 1 AS INT), 32) AS w
         |       FROM d, UNNEST(generate_series(0,
         |              CAST((length(text) + 31) // 32 - 1 AS INT))) AS g(i)),
         |nib AS (SELECT doc_id, $nibbles FROM fr),
         |vote AS (SELECT doc_id, $votes FROM nib GROUP BY doc_id),
         |sims AS (SELECT doc_id, ${DedupPack.simhashExpr} AS phash,
         |                ${DedupPack.bandValExprs.mkString(", ")} FROM vote),
         |${DedupPack.bandsCtes("phash")}
         |cand AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
         |                a.phash AS phash_i, b.phash AS phash_j
         |         FROM bands a JOIN bands b
         |           ON a.bk = b.bk AND a.band_id = b.band_id
         |          AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |          AND ${DedupPack.emitOnceSql})
         |SELECT doc_i, doc_j, phash_i, phash_j,
         |       CAST(bit_count(xor(phash_i, phash_j)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(phash_i, phash_j)) <= 4
         |ORDER BY doc_i, doc_j""".stripMargin
    },

    // empty text → NULL dims/md5, mirroring the Spark-side branch (the
    // generate_series path would yield NULL md5 for empty text anyway;
    // the CASEs make the empty-row contract explicit on both sides)
    "q73_resize_stub" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(text) = 0 THEN NULL
        |       ELSE greatest((1 + ascii(substr(text, 1, 1)) % 64) // 2, 1) END AS INT) AS out_w,
        |  CAST(CASE WHEN length(text) = 0 THEN NULL
        |       ELSE greatest((1 + ascii(substr(text, 2, 1)) % 64) // 2, 1) END AS INT) AS out_h,
        |  CAST((length(text) + 7) // 8 AS BIGINT) AS n_sampled,
        |  CASE WHEN length(text) = 0 THEN NULL
        |       ELSE md5((SELECT string_agg(substr(text, g.i, 1), '' ORDER BY g.i)
        |                 FROM UNNEST(generate_series(1, length(text), 8)) AS g(i))) END AS resized_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
