package graft

import graft.core.DedupConfig
import graft.dedup.DedupPipeline
import org.apache.spark.sql.SparkSession

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
    measure("pruned-scan-count") { clips.selectExpr("clip_id", "length(transcript)").count() }
    measure("features-count") { DedupPipeline.features(clips).count() }
    val fc = DedupPipeline.features(clips).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    measure("features-cache-build") { fc.count() }
    measure("features-cache-read") { fc.count() }
    spark.stop()
  }
}
