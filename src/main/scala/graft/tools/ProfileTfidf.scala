package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Stage-level profiler for the plain TF-IDF pair path at probe scale —
  * attributes the super-floor 30× exponent (BENCH_SCALE_r08: 2.263 vs the
  * ~2.0 quadratic-output floor) to concrete stages: per-stage wall time,
  * shuffle read/write volume, and memory/disk spill. Ad-hoc tool, not part
  * of the driver contract.
  *
  * Usage: runMain graft.tools.ProfileTfidf [corpusDir] [passes]
  */
object ProfileTfidf {

  private case class StageRow(id: Int, name: String, tasks: Int, sec: Double,
                              inMB: Long, shReadMB: Long, shWriteMB: Long,
                              spillMemMB: Long, spillDiskMB: Long,
                              peakExecMemMB: Long)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale-probe/v2-x10")
    val passes = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "32"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_REPART", "true"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "1048576")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        def mb(b: Long) = b / (1024 * 1024)
        stages.synchronized {
          stages += StageRow(si.stageId,
            si.name.takeWhile(_ != '\n').take(90), si.numTasks,
            (si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)) / 1e3,
            mb(m.inputMetrics.bytesRead),
            mb(m.shuffleReadMetrics.totalBytesRead),
            mb(m.shuffleWriteMetrics.bytesWritten),
            mb(m.memoryBytesSpilled), mb(m.diskBytesSpilled),
            mb(m.peakExecutionMemory))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup the plan shape at sf0.001 (JIT)
    graft.SparkEntry.queries("llm_tfidf_pairs")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    for (p <- 1 to passes) {
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("llm_tfidf_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(1500)
      println(f"%n=== pass $p  corpus=$dir  wall=$wall%.1f s ===")
      println(f"${"stage"}%-6s${"tasks"}%6s${"sec"}%9s${"inMB"}%8s" +
        f"${"shRdMB"}%8s${"shWrMB"}%8s${"spMemMB"}%9s${"spDskMB"}%9s" +
        f"${"peakMB"}%8s  name")
      val rows = stages.synchronized(stages.sortBy(-_.sec).take(18))
      rows.foreach { r =>
        println(f"${r.id}%-6d${r.tasks}%6d${r.sec}%9.1f${r.inMB}%8d" +
          f"${r.shReadMB}%8d${r.shWriteMB}%8d${r.spillMemMB}%9d" +
          f"${r.spillDiskMB}%9d${r.peakExecMemMB}%8d  ${r.name}")
      }
      val tot = stages.synchronized(stages.toList)
      println(f"stage-sec total ${tot.map(_.sec).sum}%.1f  " +
        f"spillDisk ${tot.map(_.spillDiskMB).sum} MB  " +
        f"shWrite ${tot.map(_.shWriteMB).sum} MB")
    }
    spark.stop()
  }
}
