package graft

import graft.core.DedupConfig
import graft.dedup._
import graft.functions.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-stage profiling at a given core count (scratch, not a test). */
object DebugEdges {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).getOrElse("40000")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig.default
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val corpus = s"/tmp/graft_bench_corpus_v${graft.corpus.CorpusGen.FormatVersion}_$n"
    val clips = spark.read.parquet(corpus)
    val f = DedupPipeline.features(clips, cfg).persist()
    timed("features")(f.count())
    val cands = DedupPipeline.candidates(f, cfg).persist()
    val nc = timed("candidates")(cands.count())
    println(s"candidates=$nc")
    println("lane histogram:")
    cands.groupBy("lane").count().orderBy("lane").collect()
      .foreach(r => println(s"  lane=${r.get(0)} n=${r.getLong(1)}"))
    // mirror of verifiedEdges with per-branch timing
    val slimA = f.select(col("id").as("a"), col("simhash").as("sim_a"),
      col("nsh").as("nsh_a"), col("nlen").as("nlen_a"))
    val slimB = f.select(col("id").as("b"), col("simhash").as("sim_b"),
      col("nsh").as("nsh_b"), col("nlen").as("nlen_b"))
    val slim = cands.join(slimA, "a").join(slimB, "b")
      .withColumn("ham_ok", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= cfg.hammingMax)
      .withColumn("jac_possible", (col("lane").bitwiseAND(lit(1)) =!= 0) &&
        least(col("nsh_a"), col("nsh_b")).cast("double") >=
          greatest(col("nsh_a"), col("nsh_b")) * cfg.jaccardThreshold)
      .withColumn("con_possible", (col("lane").bitwiseAND(lit(4)) =!= 0) &&
        least(col("nlen_a"), col("nlen_b")) >= cfg.minContainLen)
      .persist()
    timed("slim-join")(slim.count())
    println(s"ham=${timed("ham")(slim.where(col("ham_ok")).count())}")
    val need = slim.where(!col("ham_ok") && (col("jac_possible") || col("con_possible")))
      .select(col("a"), col("b"), col("jac_possible"), col("con_possible"))
    val normA = f.select(col("id").as("a"), col("norm").as("norm_a"))
    val normB = f.select(col("id").as("b"), col("norm").as("norm_b"))
    val withNorms = need.join(normA, "a").join(normB, "b").persist()
    timed("norm-join")(withNorms.count())
    println(s"jac=${timed("jaccard")(withNorms.where(col("jac_possible") &&
      jaccard_ge(col("norm_a"), col("norm_b"))).count())}")
    println(s"con=${timed("sa-pass")(DedupPipeline.containmentEdges(
      withNorms.where(col("con_possible")), cfg).count())}")
    spark.stop()
  }
}
