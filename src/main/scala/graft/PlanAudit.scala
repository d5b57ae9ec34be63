package graft

import graft.core.DedupConfig
import graft.dedup.DedupPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan auditor: prints the physical plans of the dedup pipeline stages so
  * scan pruning / pushdown / join strategies can be eyeballed (and so scale
  * regressions like an un-pruned audio `bytes` column are caught without a
  * profiler). Run: sbt "runMain graft.PlanAudit [corpusPath]". */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_bench_corpus_160000")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val clips = spark.read.parquet(path)
    val f = DedupPipeline.features(clips, DedupConfig.default)
    println("==== features: scan lines ====")
    f.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("ReadSchema"))
      .foreach(println)
    println("==== candidates: scan lines ====")
    val cands = DedupPipeline.candidates(f, DedupConfig.default)
    cands.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("ReadSchema") || l.contains("Exchange"))
      .foreach(println)

    // measured bytes: what does a pruned scan / a cached scan actually report?
    val in = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        in.addAndGet(e.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    def measure(tag: String)(body: => Unit): Unit = {
      in.set(0); body
      Thread.sleep(500)
      println(f"MEASURE $tag in=${in.get / 1e6}%.1fM")
    }
    // the real pipeline shape: f persisted, then candidates — is the packed
    // bucket cache actually used on the probe side of the salt join?
    val fc = DedupPipeline.features(clips, DedupConfig.default)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fc.count()
    val stageLog = new scala.collection.mutable.ArrayBuffer[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stageLog += f"STAGE ${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%3d " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f in=${m.inputMetrics.bytesRead / 1e6}%8.1fM " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fM sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM"
      }
    })
    val assign = DedupPipeline.run(clips, DedupConfig.default)
    val chk = assign.select(sum(crc32(concat_ws(",", col("clip_id"), col("rep_clip_id")))).as("c"))
      .collect()(0).getLong(0)
    println("==== checksum = " + chk)
    Thread.sleep(500)
    println(stageLog.mkString("\n"))
    spark.stop()
  }
}
