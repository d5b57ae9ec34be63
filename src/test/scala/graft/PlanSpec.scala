package graft

import graft.corpus.CorpusGen
import graft.dedup.DedupPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Physical-plan shape assertions — the 100 TB guarantees the code relies
  * on must be visible in `explain`, not assumed. */
class PlanSpec extends AnyFunSuite with SparkTest {

  private lazy val corpusPath = {
    val dir = Files.createTempDirectory("graft-plan").toString + "/clips"
    CorpusGen.clips(spark, 200).write.mode("overwrite").parquet(dir)
    dir
  }

  test("features stage prunes the audio bytes column from the parquet scan") {
    val clips = spark.read.parquet(corpusPath)
    val plan = DedupPipeline.features(clips).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"),
      s"audio bytes column must not be read by text stages:\n$plan")
  }

  test("filters on scan columns push down to parquet") {
    val clips = spark.read.parquet(corpusPath)
    val plan = clips.where(col("sr_hz") === 8000)
      .select(col("clip_id")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(sr_hz), EqualTo(sr_hz,8000)]"),
      s"expected pushed filter:\n$plan")
  }

  test("dimension join broadcasts the small side") {
    val plan = SparkEntry.queries("q03_join_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("aggregations use partial (map-side) aggregation") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // HashAggregate appears twice per group-by: partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"expected partial agg:\n$plan")
  }

  test("sketch aggregate runs as ObjectHashAggregate with partial merge") {
    val plan = SparkEntry.queries("q09_heavy_hitters_sketch")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_graft_freq_sketch_topk"), s"expected partial sketch agg:\n$plan")
  }
}
