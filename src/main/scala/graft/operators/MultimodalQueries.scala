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

  /** Each document's bytes (truncated to whole 16-bit samples) wrapped as
    * a REAL mono PCM WAV — the audio twin of [[bmpMediaTable]]. */
  def wavMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val even = java.util.Arrays.copyOf(bytes, bytes.length / 2 * 2)
        (id, MediaCodec.encodeWav(8000, 1, 16, even), "wav")
      })
      .toDF("media_id", "payload", "format")
  }

  final case class MediaResize(media_id: Long, out_w: Int, out_h: Int,
                               b0_sum: Long, b1_sum: Long, b2_sum: Long,
                               blocks: String)
  final case class MediaFrames(media_id: Long, n_samples: Long,
                               n_frames: Long, e0: Long, energies: String)

  /** Partition-batched RESIZE: decode → 4×4 box-filter block sums per
    * channel ([[MediaCodec.resizeBlockSums]]). */
  def resizeFeatures(media: DataFrame): Dataset[MediaResize] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decode(bytes).map { d =>
          val sums = MediaCodec.resizeBlockSums(d.region, d.width, d.height,
            d.channels, 4)
          MediaResize(id, (d.width + 3) / 4, (d.height + 3) / 4,
            sums(0), sums(1), sums(2), sums.mkString(","))
        }
      })
  }

  /** Partition-batched FRAME SAMPLING: decode → every-256th-sample
    * 64-sample energy frames ([[MediaCodec.frameEnergies]]). */
  def frameFeatures(media: DataFrame): Dataset[MediaFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decode(bytes).map { d =>
          val es = MediaCodec.frameEnergies(d.region)
          MediaFrames(id, (d.region.length / 2).toLong, es.length.toLong,
            if (es.isEmpty) 0L else es(0), es.mkString(","))
        }
      })
  }

  val registry: Map[String, QueryDef] = Map(

    // ── RESIZE (4×4 box-filter block sums over the decoded pixel region,
    //    integer-exact): first three blocks + md5 of the full block
    //    array; DuckDB re-derives every block from the text bytes ──
    "q101_media_resize" -> QueryDef(
      (s, d) => resizeFeatures(bmpMediaTable(s, d)).toDF()
        .select(col("media_id"), col("out_w"), col("out_h"),
          col("b0_sum"), col("b1_sum"), col("b2_sum"),
          md5(col("blocks")).as("blocks_md5"))
        .orderBy(col("media_id")),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    CAST(greatest(1, (length(text) + 95) // 96) AS INT) AS h, text
             |  FROM documents),
             |b AS (SELECT media_id, h,
             |  list_transform(range(0, ((h + 3) // 4) * 24), bi ->
             |    list_sum(list_transform(range(0, 16), k ->
             |      CASE WHEN (bi // 24) * 4 + k // 4 < h
             |        AND ((bi // 24) * 4 + k // 4) * 96
             |            + ((bi % 24) // 3 * 4 + k % 4) * 3 + bi % 3 + 1
             |            <= length(text)
             |      THEN ascii(text[CAST(((bi // 24) * 4 + k // 4) * 96
             |            + ((bi % 24) // 3 * 4 + k % 4) * 3 + bi % 3 + 1 AS INT)])
             |      ELSE 0 END))) AS es
             |  FROM m)
             |SELECT media_id, 8 AS out_w, CAST((h + 3) // 4 AS INT) AS out_h,
             |  CAST(es[1] AS BIGINT) AS b0_sum, CAST(es[2] AS BIGINT) AS b1_sum,
             |  CAST(es[3] AS BIGINT) AS b2_sum,
             |  md5(array_to_string(es, ',')) AS blocks_md5
             |FROM b ORDER BY media_id""".stripMargin)),

    // ── FRAME SAMPLING (hop 256, window 64 over the decoded 16-bit PCM
    //    stream, integer |sample| energies): count + first frame + md5
    //    of the energy profile; DuckDB re-derives the sample stream ──
    "q102_media_framesample" -> QueryDef(
      (s, d) => frameFeatures(wavMediaTable(s, d)).toDF()
        .select(col("media_id"), col("n_samples"), col("n_frames"),
          col("e0"), md5(col("energies")).as("energies_md5"))
        .orderBy(col("media_id")),
      Some("""WITH w AS (SELECT doc_id AS media_id, length(text) // 2 AS nsamp,
             |           text FROM documents),
             |sa AS (SELECT media_id, nsamp,
             |  list_transform(range(1, nsamp + 1), i ->
             |    abs(CASE WHEN ascii(text[CAST(2*i-1 AS INT)])
             |               + 256 * ascii(text[CAST(2*i AS INT)]) >= 32768
             |        THEN ascii(text[CAST(2*i-1 AS INT)])
             |               + 256 * ascii(text[CAST(2*i AS INT)]) - 65536
             |        ELSE ascii(text[CAST(2*i-1 AS INT)])
             |               + 256 * ascii(text[CAST(2*i AS INT)]) END)) AS s
             |  FROM w),
             |f AS (SELECT media_id, nsamp,
             |  list_transform(range(0, (nsamp + 255) // 256), fi ->
             |    list_sum(list_transform(range(0, 64), j ->
             |      CASE WHEN fi * 256 + j < nsamp
             |           THEN s[CAST(fi * 256 + j + 1 AS INT)] ELSE 0 END))) AS es
             |  FROM sa)
             |SELECT media_id, CAST(nsamp AS BIGINT) AS n_samples,
             |  CAST(len(es) AS BIGINT) AS n_frames,
             |  CAST(COALESCE(es[1], 0) AS BIGINT) AS e0,
             |  md5(array_to_string(es, ',')) AS energies_md5
             |FROM f ORDER BY media_id""".stripMargin)),
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
