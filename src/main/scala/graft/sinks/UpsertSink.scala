package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

/** S5: the record/prediction upsert sink, in the reference's two idioms
  * (reference `src/importer/batched_statements.rs:23-108` +
  * `per_schedule_importer.rs:404-456`):
  *
  *  1. [[jdbcUpsert]] — batched last-wins upsert over JDBC: per 1000-row
  *     transaction, an UPDATE … WHERE key = ? AND version <= ? batch, then
  *     INSERT for the rows the update didn't reach, swallowing
  *     duplicate-key races (the reference's `INSERT IGNORE`). Runs as
  *     `foreachPartition`, so every executor streams its partition into the
  *     database concurrently — the reference's per-thread batched
  *     statements map 1:1 onto partitions.
  *  2. [[mergeIntoPartitionedRecords]] — partition-scoped parquet merge:
  *     the records table is partitioned by `trip_start_date`; a micro-batch
  *     only ever touches a handful of service days, so only THOSE partition
  *     directories are read, merged last-wins, and dynamically overwritten.
  *     O(touched partitions) I/O per batch instead of O(table) — the shape
  *     that survives a year of records at 100 TB.
  */
object UpsertSink {

  /** Rows per transaction — the reference's batch size
    * (`batched_statements.rs:26` `BATCH_SIZE = 1000`). */
  val BatchSize = 1000

  /** Batched last-wins upsert: newest `versionCol` wins per `keyCols`.
    *
    * For every row: UPDATE … SET (non-key cols) WHERE key AND
    * `versionCol` <= new version; rows the UPDATE did not touch are either
    * absent (INSERT them) or strictly newer (skip). A duplicate-key failure
    * on INSERT means a concurrent writer won the race — re-run the UPDATE
    * so the newest version still wins regardless of arrival order.
    *
    * `url` must be a JDBC URL whose driver is on the executor classpath
    * (Derby is bundled with Spark; server DBs work the same way). The
    * target table must exist.
    */
  def jdbcUpsert(df: DataFrame, url: String, table: String,
                 keyCols: Seq[String], versionCol: String,
                 batchSize: Int = BatchSize): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    val dataCols = cols.filterNot(keyCols.contains)
    require(dataCols.contains(versionCol), s"$versionCol must be a non-key column")
    val updateSql =
      s"UPDATE $table SET ${dataCols.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")} AND $versionCol <= ?"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val colIndex = cols.zipWithIndex.toMap

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val update = conn.prepareStatement(updateSql)
          val insert = conn.prepareStatement(insertSql)

          def bindUpdate(r: Row): Unit = {
            dataCols.zipWithIndex.foreach { case (c, i) =>
              update.setObject(i + 1, r.get(colIndex(c)))
            }
            keyCols.zipWithIndex.foreach { case (c, i) =>
              update.setObject(dataCols.length + i + 1, r.get(colIndex(c)))
            }
            update.setObject(dataCols.length + keyCols.length + 1,
              r.get(colIndex(versionCol)))
          }

          rows.grouped(batchSize).foreach { chunk =>
            chunk.foreach { r => bindUpdate(r); update.addBatch() }
            val counts = update.executeBatch()
            // rows the UPDATE missed: absent (insert) or strictly newer
            // (skip). Drivers returning SUCCESS_NO_INFO (-2) report the row
            // as touched, which is the safe side (no duplicate insert).
            chunk.zip(counts).filter(_._2 == 0).map(_._1).foreach { r =>
              cols.zipWithIndex.foreach { case (c, i) =>
                insert.setObject(i + 1, r.get(colIndex(c)))
              }
              try insert.executeUpdate()
              catch {
                case e: SQLException if e.getSQLState == "23505" =>
                  // lost an insert race (the reference's INSERT IGNORE);
                  // re-run the guarded update so newest-version still wins
                  bindUpdate(r); update.executeUpdate(); ()
              }
            }
            conn.commit() // one transaction per batch, like the reference
          }
        } finally conn.close()
      }
    }
  }

  /** Partition-scoped last-wins merge into a partitioned parquet table.
    * Reads ONLY the partitions the batch touches (partition pruning on the
    * IN filter), merges newest-`versionCol`-wins per `keyCols`, and
    * overwrites ONLY those partition directories (dynamic partition
    * overwrite). */
  def mergeIntoPartitioned(spark: SparkSession, batch: DataFrame, path: String,
                           keyCols: Seq[String], versionCol: String,
                           partitionCol: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    val ckpt = graft.operators.Checkpoints.cycle()
    // Materialize the micro-batch ONCE up front: this sink interrogates
    // it three times (emptiness, touched partitions, the merge itself),
    // and an un-materialized batch re-executes its full upstream plan per
    // pass — for the predictions stream that is the whole realtime
    // ladder. Same-session A/B (StreamBench r7, 2000 vehicles, 5 s
    // trigger): predictions batch median 9.8 s before, 6.0/7.2 s across
    // two runs after. Micro-batch-sized, so the materialization itself
    // is cheap.
    val b = ckpt.truncate(batch)
    // An empty micro-batch must write NOTHING: overwriting with an empty
    // frame would still create the table directory without any parquet
    // footer, and the next batch's read of that dir throws
    // UNABLE_TO_INFER_SCHEMA and kills the stream (found by StreamBench,
    // r7 — a quiet first trigger interval was enough to break the
    // automatic mode permanently).
    if (b.isEmpty) { ckpt.release(); return }
    // ...and existence must mean READABLE data, not just a directory: a
    // crash between mkdir and commit leaves the footer-less state too
    val existing0 =
      if (!new java.io.File(path).exists()) None
      else try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val merged = if (existing0.isDefined) {
      // touched partitions: bounded by the feed horizon (a 5 s micro-batch
      // covers one or two service days), never by data volume
      val touched = b.select(partitionCol).distinct().collect().map(_.get(0))
      val (nullsTouched, values) = touched.partition(_ == null)
      // isin(null) never matches: the null partition needs its own predicate
      // or existing null-keyed rows would be overwritten instead of merged
      val touchedPred =
        if (nullsTouched.nonEmpty)
          col(partitionCol).isin(values.toSeq: _*) || col(partitionCol).isNull
        else col(partitionCol).isin(values.toSeq: _*)
      val existing = existing0.get
        .filter(touchedPred)
        .select(batch.columns.map(col): _*) // partition col back in place
      existing.unionByName(b)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        // cut lineage to the files about to be replaced (cannot overwrite a
        // path that is also being read from); micro-batch-sized, so cheap.
        // Reliable checkpoint when a dir is configured: if an executor is
        // lost between the cut and the overwrite, local blocks would be
        // unrecoverable while the target files are mid-replacement.
        .transform(ckpt.truncate)
    } else b
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    // the overwrite is committed: the batch's checkpoint data has no
    // remaining reader — delete it, or a long-running stream accumulates
    // one directory per micro-batch forever (ADVICE r6)
    ckpt.release()
  }

  /** The records-table instantiation: newest time_of_recording wins per
    * logical record key, partitioned by service day. */
  def mergeIntoPartitionedRecords(spark: SparkSession, batch: DataFrame,
                                  recordsPath: String): Unit =
    mergeIntoPartitioned(spark, batch, recordsPath,
      keyCols = Seq("source", "route_id", "route_variant", "trip_id",
        "trip_start_date", "trip_start_time", "stop_sequence"),
      versionCol = "time_of_recording", partitionCol = "trip_start_date")
}
