package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs batched per partition (the JVM
  * equivalent of `mapInPandas`: one iterator per partition, vectorizable
  * batch shape, no per-row UDF dispatch).
  *
  * The decode step is a STUB — this container has no image/audio codecs, so
  * `stubDecode` derives deterministic fake dimensions/features from the
  * bytes. The Spark-side plumbing (schema, binary handling, partition-
  * batched execution, feature schema) is real and tested; swapping
  * `stubDecode` for a JNI/codec call is a local change.
  */
object MultimodalQueries {

  final case class MediaMeta(media_id: Long, n_bytes: Long, format: String,
                             width: Int, height: Int, channels: Int)
  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
                                 patch_means: Seq[Float])

  /** STUB decode: deterministic pseudo-metadata from the payload bytes
    * (stands in for an image header parse). */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 577)        // 64..640
    val height = 64 + math.floorMod(h >> 16, 417) // 64..480
    (width, height, 3)
  }

  /** STUB feature extraction: 16 "patch means" over the byte stream
    * (stands in for pooled CNN features / mel energies). */
  def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    val n = 16
    val out = new Array[Float](n)
    if (bytes.isEmpty) return out
    val chunk = math.max(1, bytes.length / n)
    var i = 0
    while (i < n) {
      var sum = 0L
      var c = 0
      var j = i * chunk
      val end = math.min(bytes.length, (i + 1) * chunk)
      while (j < end) { sum += bytes(j) & 0xff; c += 1; j += 1 }
      out(i) = if (c == 0) 0f else sum.toFloat / (c * 255f)
      i += 1
    }
    out
  }

  /** documents.text reinterpreted as a binary payload column — the
    * synthetic stand-in for an image/audio table (binary + metadata). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"))

  /** Partition-batched decode: metadata per payload. The `mapPartitions`
    * boundary is the batch shape — one task decodes its whole partition
    * without per-row serialization round-trips. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val (w, h, c) = stubDecode(bytes)
        MediaMeta(id, bytes.length.toLong, fmt, w, h, c)
      })
  }

  /** Partition-batched feature extraction (the "resize + embed" stage). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, _) = stubDecode(bytes)
        MediaFeatures(id, w, h, stubFeatures(bytes).toSeq)
      })
  }

  val registry: Map[String, QueryDef] = Map(
    // byte-level metadata is engine-real (no stub in the measured columns):
    // payload sizes survive the binary cast intact and DuckDB can verify
    "q37_media_bytes" -> QueryDef(
      (s, d) => mediaTable(s, d)
        .select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
        .groupBy((col("n_bytes") / 100).cast("int").as("size_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("size_bucket")),
      Some("""SELECT CAST(length(text) // 100 AS INT) AS size_bucket,
             |  COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS total_bytes
             |FROM documents GROUP BY 1 ORDER BY size_bucket""".stripMargin)),

    // full stub pipeline: decode + features (stub semantics -> rows-only)
    "q38_media_features" -> QueryDef(
      (s, d) => extractFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("patch_means"), 1), 6).as("p0"))
        .orderBy(col("media_id")),
      None)
  )
}
