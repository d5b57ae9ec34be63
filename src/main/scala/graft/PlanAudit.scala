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
    val path = args.headOption.getOrElse(s"/tmp/graft_bench_corpus_v${graft.corpus.CorpusGen.FormatVersion}_160000")
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
    // fps-hits distribution over the containment-eligible pair set, split by
    // whether the containment predicate actually holds — quantifies what a
    // hits>=2 gate would drop
    val cfg = DedupConfig.default
    val cands3 = DedupPipeline.candidates(fc, cfg)
    val slimT = fc.select(col("id"), col("simhash"), col("nlen"))
    val conNeed = cands3
      .join(slimT.select(col("id").as("a"), col("simhash").as("sim_a"), col("nlen").as("nlen_a")), "a")
      .join(slimT.select(col("id").as("b"), col("simhash").as("sim_b"), col("nlen").as("nlen_b")), "b")
      .where(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) > cfg.hammingMax)
      .where((col("lane").bitwiseAND(lit(4)) =!= 0) &&
        least(col("nlen_a"), col("nlen_b")) >= cfg.minContainLen)
      .select(col("a"), col("b"), col("fps_hits"),
        least(col("nlen_a"), col("nlen_b")).as("minlen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = fc.select(col("id"), col("norm"))
    val withN = conNeed
      .join(norms.select(col("id").as("a"), col("norm").as("norm_a")), "a")
      .join(norms.select(col("id").as("b"), col("norm").as("norm_b")), "b")
    val trueCon = DedupPipeline.containmentEdges(withN, cfg)
      .withColumn("isCon", lit(true))
    val dist = conNeed.join(trueCon, Seq("a", "b"), "left")
      .groupBy(col("isCon").isNotNull.as("con"),
        when(col("fps_hits") >= 3, lit(3)).otherwise(col("fps_hits")).as("hits"),
        (col("minlen") >= 150).as("long"))
      .count().orderBy(col("con"), col("hits"), col("long"))
    dist.collect().foreach(r => println(s"CONDIST con=${r.get(0)} hits=${r.get(1)} long=${r.get(2)} n=${r.get(3)}"))
    spark.stop()
  }
}
