package graft

import org.apache.spark.sql.SparkSession

/** One-query profiler: runs a SparkEntry query with a job/stage listener.
  * sbt "runMain graft.QueryProf <name> [sfDir] [cores]" */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.broadcast.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, e.time)
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        System.err.println(f"JOB ${e.jobId}%4d ${(e.time - Option(jobStart.get(e.jobId)).getOrElse(e.time)) / 1e3}%7.2fs")
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        System.err.println(f"STAGE ${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%4d " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%8.2f " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fM sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fM " +
          e.stageInfo.name.take(60))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
