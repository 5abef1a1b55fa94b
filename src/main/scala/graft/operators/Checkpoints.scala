package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for iterative operators (connected
  * components, Lloyd's k-means): every round must cut the plan or it
  * doubles per iteration (measured in BENCH_r02: 80.8 s -> < 2 s).
  *
  * `localCheckpoint` stores blocks on executors only — fine on local[32]
  * and fast, but on a real cluster a lost executor invalidates its blocks
  * and kills a multi-hour run mid-iteration. When the session has a
  * RELIABLE checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(...)`, typically HDFS/S3 on a
  * cluster), iterative operators should use `checkpoint()` instead: the
  * round's result is persisted to fault-tolerant storage and recomputation
  * after executor loss restarts from the last round, not from round zero.
  *
  * This helper picks the strategy from the session: reliable `checkpoint`
  * when a checkpoint dir is set, `localCheckpoint` otherwise. Both are
  * eager, so callers may `unpersist` upstream caches immediately after. */
object Checkpoints {

  /** Eagerly materialize `df` and truncate its lineage, using reliable
    * storage when the SparkContext has a checkpoint dir configured. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else
      df.localCheckpoint()
}
