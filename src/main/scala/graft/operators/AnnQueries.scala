package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table.
  * q26 (TextQueries) is the brute-force baseline; this battery adds the
  * scale path: an IVF-style index — partition vectors into coarse cells,
  * probe only the nearest cell(s). Cells here are the `label` column
  * standing in for k-means cell ids; the centroid math (posexplode +
  * per-dimension avg -> codegen'd hash aggregate) is exactly what a k-means
  * assignment step runs at scale, and `nprobe` controls the recall/cost
  * trade-off. */
object AnnQueries {

  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)

  /** Per-cell centroids: one row per label, centroid as Array[Double].
    * posexplode + groupBy(label, pos) is a single shuffle of (rows x dim)
    * scalar values — the layout columnar engines want, no array UDAF. */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("cm"))
      .select(col("label"), transform(col("cm"), _.getField("m")).as("centroid"))

  /** IVF search: rank cells by centroid cosine against the probe, then
    * brute-force only the top `nprobe` cells. */
  def ivfSearch(embeddings: DataFrame, probe: DataFrame,
                k: Int = 10, nprobe: Int = 1): DataFrame = {
    val cents = centroids(embeddings)
    val e = embeddings.select(col("label"), col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val p = probe.select(transform(col("embedding"), _.cast("double")).as("pv"))
      .withColumn("pnorm", sqrt(dot(col("pv"), col("pv"))))
    val cellRank = cents.crossJoin(broadcast(p))
      .withColumn("cell_sim", dot(col("centroid"), col("pv")) /
        (sqrt(dot(col("centroid"), col("centroid"))) * col("pnorm")))
      .orderBy(col("cell_sim").desc)
      .limit(nprobe)
      .select("label")
    e.join(broadcast(cellRank), Seq("label")) // prune to probed cells
      .crossJoin(broadcast(p))
      .withColumn("cos_sim", round(dot(col("v"), col("pv")) / (col("norm") * col("pnorm")), 6))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .select(col("vec_id"), col("cos_sim"))
      .limit(k)
  }

  val registry: Map[String, QueryDef] = Map(
    // IVF ANN: probe = lowest vec_id, nprobe=1 (rows-only: cell choice is
    // engine-internal; AnnSpec checks agreement with brute force)
    "q39_ivf_ann" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        ivfSearch(e, e.orderBy(col("vec_id")).limit(1), k = 10, nprobe = 1)
      },
      None))
}
