package graft

import org.apache.spark.sql.SparkSession

/** One-query profiler: runs a SparkEntry query with a job/stage listener
  * under the SAME session conf + staged-table layout as graft.Bench's query
  * section (32-way staged sf tables, 4m scan bins, AQE on, 256m broadcast
  * threshold), so its stage economics match what the bench times.
  * sbt "runMain graft.QueryProf <name> [sfDir] [cores] [reps]" */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.broadcast.compress", "false")
      .config("spark.broadcast.blockSize", "64m")
      .config("spark.storage.memoryMapThreshold", "2g")
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.io.compression.lz4.blockSize", "512k")
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
          f"spill=${m.diskBytesSpilled / 1e6}%5.1fM " +
          e.stageInfo.name.take(70))
      }
    })
    // mirror Bench: 4m scan bins over a 32-file staged copy of each table
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    val stagedDir = BenchExtra.stageSfTables(spark, sfDir, cores)
    // session warm-up (codegen, parquet footers, first shuffle), like Bench
    try spark.read.parquet(s"$stagedDir/lineitem.parquet")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag")).count()
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    try { corpus.CorpusGen.clipsCached(spark, 1000).count(); corpus.CorpusGen.clipsCached(spark, 500).count() }
    catch { case _: Throwable => () }
    for (r <- 1 to reps) {
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, stagedDir).write.mode("overwrite").format("noop").save()
      println(f"TOTAL rep $r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
