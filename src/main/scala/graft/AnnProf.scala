package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the 1M-vector ANN lanes (the bench's ann block
  * in isolation, same session conf as graft.Bench's query section).
  * sbt "runMain graft.AnnProf [n] [lane] [reps]"   lane: lsh|ivf|both */
object AnnProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val lane = if (args.length > 1) args(1) else "lsh"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        System.err.println(f"STAGE ${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%4d " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%8.2f " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fM sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM " +
          f"spill=${m.diskBytesSpilled / 1e6}%7.1fM " +
          e.stageInfo.name.take(70))
      }
    })
    val vecs = graft.corpus.EmbedGen.vectorsCached(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    for (r <- 1 to reps) {
      if (lane == "lsh" || lane == "both") {
        val t0 = System.nanoTime()
        val l = graft.ann.Ann.lshTopK(vecs, 3, planesPerTable = 16, tables = 8)
          .select(col("vec_id"), col("neighbor_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rows = l.count()
        println(f"LSH rep $r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
        l.unpersist(blocking = true)
      }
      if (lane == "ivf" || lane == "both") {
        val sampleStep = math.max(1L, n / 1000L)
        val queries = vecs.where(pmod(col("vec_id"), lit(sampleStep)) === 0)
        val t0 = System.nanoTime()
        val i = graft.ann.Ann.ivfTopK(queries, vecs, 3, nlist = 1024, nprobe = 32)
          .select(col("vec_id"), col("neighbor_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rows = i.count()
        println(f"IVF rep $r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
        i.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
