package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Checkpoints.truncate]] strategy selection: reliable `checkpoint` when
  * the context has a checkpoint dir (cluster mode — survives executor
  * loss), `localCheckpoint` otherwise. The iterative operators (connected
  * components, k-means) must produce identical results in both modes. */
class CheckpointsSpec extends SparkSpec {

  /** Restore "no checkpoint dir" after the reliable-mode block —
    * SparkContext has no public unset, but private[spark] members are
    * public in bytecode. */
  private def withCheckpointDir[T](f: => T): T = {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    sc.setCheckpointDir(dir.toString)
    try f
    finally sc.getClass
      .getMethod("checkpointDir_$eq", classOf[Option[String]])
      .invoke(sc, None)
  }

  test("CC and k-means identical under reliable checkpoint and localCheckpoint") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(300)(
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2).toDF("u", "v")
    val vertices = spark.range(120).toDF("id")
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()), s"l${i % 4}"))
      .toDF("vec_id", "embedding", "label")

    def ccRun() = ConnectedComponents.components(vertices, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    def kmRun() = AnnQueries.kmeansCells(emb, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq

    assert(spark.sparkContext.getCheckpointDir.isEmpty, "precondition: local mode")
    val (ccLocal, kmLocal) = (ccRun(), kmRun())
    val (ccReliable, kmReliable, files) = withCheckpointDir {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val cc = ccRun()
      val km = kmRun()
      // the reliable path must actually write checkpoint files
      val root = new java.io.File(spark.sparkContext.getCheckpointDir.get)
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(countFiles).sum else 1
      (cc, km, countFiles(root))
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty, "dir restored")
    assert(ccReliable === ccLocal)
    assert(kmReliable === kmLocal)
    assert(files > 0, "reliable mode wrote checkpoint files")
  }
}
