package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MediaCodec
import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs batched per partition (the JVM
  * equivalent of `mapInPandas`: one iterator per partition, vectorizable
  * batch shape, no per-row UDF dispatch).
  *
  * The decode step is REAL: payloads are genuine 24-bit BMP files
  * (synthesized from the documents corpus by [[bmpMediaTable]]) parsed by
  * the pure-JVM [[graft.functions.MediaCodec]] (BMP + PCM WAV — fully
  * specified public formats needing no native libraries). Opaque codecs
  * (JPEG/PNG/MP3) would need external libraries this container lacks;
  * swapping one in is a local change to `MediaCodec.decode`. Unrecognized
  * payloads are SKIPPED, never failing the batch (the corrupt-feed policy
  * of the GTFS-RT ingest).
  */
object MultimodalQueries {

  final case class MediaMeta(media_id: Long, n_bytes: Long, format: String,
                             width: Int, height: Int, channels: Int)
  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
                                 patch_means: Seq[Float])

  /** documents.text reinterpreted as a binary payload column — the
    * synthetic stand-in for a raw-bytes media table (q37's byte-level
    * plumbing check). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"))

  /** Pixel width used when wrapping a byte stream as a BMP: 32 px * 3
    * bytes = 96-byte rows (already 4-byte aligned, so no pad ambiguity). */
  val BmpWrapWidth = 32

  /** Each document's bytes wrapped as a REAL 24-bit BMP (the text bytes
    * become the pixel array, zero-padded to whole rows). Runs in the same
    * partition-batched shape as the decode stage. */
  def bmpMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val rowSize = MediaCodec.bmpRowSize(BmpWrapWidth)
        val height = math.max(1, (bytes.length + rowSize - 1) / rowSize)
        (id, MediaCodec.encodeBmp24(BmpWrapWidth, height, bytes), "bmp")
      })
      .toDF("media_id", "payload", "format")
  }

  /** Partition-batched decode: metadata per payload via the real header
    * parse. The `mapPartitions` boundary is the batch shape — one task
    * decodes its whole partition without per-row serialization round
    * trips; undecodable payloads are dropped. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decode(bytes).map(d =>
          MediaMeta(id, bytes.length.toLong, d.format, d.width, d.height, d.channels))
      })
  }

  /** Partition-batched feature extraction (the "resize + embed" stage):
    * patch means over the DECODED pixel/sample region, not the raw file
    * bytes. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decode(bytes).map(d =>
          MediaFeatures(id, d.width, d.height,
            MediaCodec.patchMeans(d.region).toSeq))
      })
  }

  val registry: Map[String, QueryDef] = Map(
    // byte-level metadata is engine-real (no decode in the measured
    // columns): payload sizes survive the binary cast intact and DuckDB
    // can verify
    "q37_media_bytes" -> QueryDef(
      (s, d) => mediaTable(s, d)
        .select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
        .groupBy((col("n_bytes") / 100).cast("int").as("size_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("size_bucket")),
      Some("""SELECT CAST(length(text) // 100 AS INT) AS size_bucket,
             |  COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS total_bytes
             |FROM documents GROUP BY 1 ORDER BY size_bucket""".stripMargin)),

    // full pipeline: encode -> decode -> features over the decoded pixel
    // region. Oracle (upgraded from rows-only in r5): patch 0's mean is an
    // EXACT integer sum of the first chunk's byte values (pads add 0 but
    // count in the denominator) followed by one float32 division —
    // reproduced in DuckDB with the same float32 cast, so the hash compare
    // is bit-stable (verified at sf0.001/0.01/0.1).
    "q38_media_features" -> QueryDef(
      (s, d) => extractFeatures(bmpMediaTable(s, d)).toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("patch_means"), 1), 6).as("p0"))
        .orderBy(col("media_id")),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    CAST(greatest(1, (length(text) + 95) // 96) AS INT) AS height, text
             |  FROM documents),
             |p AS (SELECT media_id, height,
             |    (96 * height) // 16 AS chunk, text FROM m)
             |SELECT media_id, 32 AS width, height,
             |  CAST(ROUND(CAST(CAST(list_sum(list_transform(range(1, least(chunk, length(text)) + 1),
             |      i -> ascii(text[i]))) AS FLOAT) / CAST(chunk * 255 AS FLOAT) AS DOUBLE), 6) AS FLOAT) AS p0
             |FROM p ORDER BY media_id""".stripMargin)),

    // REAL decode, hash-checked: the parsed BMP header fields must equal
    // the wrap arithmetic DuckDB derives from the text lengths (32 px
    // rows of 96 bytes, zero-padded, 54-byte header)
    "q54_media_decode" -> QueryDef(
      (s, d) => decodeMeta(bmpMediaTable(s, d)).toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("n_bytes"))
        .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id, 'bmp' AS format, 32 AS width,
             |  CAST(greatest(1, (length(text) + 95) // 96) AS INT) AS height,
             |  3 AS channels,
             |  CAST(54 + 96 * greatest(1, (length(text) + 95) // 96) AS BIGINT) AS n_bytes
             |FROM documents ORDER BY media_id""".stripMargin))
  )
}
