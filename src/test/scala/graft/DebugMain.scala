package graft

import graft.core.DedupConfig
import graft.corpus.CorpusGen
import graft.dedup._
import org.apache.spark.sql.functions._

/** Scratch bisection runner (not a test). */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cfg = DedupConfig.default
    val n = 300
    val pl = CorpusGen.plan(n, 42L)
    val clips = spark.createDataset(
      (0 until n).map(i => (CorpusGen.clipId(i.toLong), CorpusGen.clipSpec(42L, i.toLong, pl).transcript))
    ).toDF("clip_id", "transcript")

    val f = DedupPipeline.features(clips, cfg).persist()
    println(s"features: ${f.count()}")

    Seq("bands", "blocks", "fps").foreach { lane =>
      val buckets = f.select(explode(col(lane)).as("key"), $"id").as[CandidatePairs.Bucket]
      println(s"lane $lane: buckets=${buckets.count()} " +
        s"distinctKeys=${buckets.select("key").distinct().count()} " +
        s"pairs=${CandidatePairs.pairs(buckets, cfg).count()}")
    }

    val cands = DedupPipeline.candidates(f, cfg)
    println(s"candidates: ${cands.count()}")

    val edges = DedupPipeline.verifiedEdges(f, cands, cfg)
    println(s"edges: ${edges.count()}")

    val labels = ConnectedComponents.run(edges)
    println(s"labels: ${labels.count()}")

    val assign = DedupPipeline.assignments(f, labels)
    println(s"assignments: ${assign.count()}")
    spark.stop()
  }
}
