package graft.dedup

import graft.SparkTest
import graft.core.DedupConfig
import graft.corpus.CorpusGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ExactIds]]: the 64-bit-id collision detect + deterministic re-key pass
  * (VERDICT r3 #7). A real Murmur3 collision can't be planted by brute
  * force, so the repair machinery is exercised on a deliberately WEAK id
  * (hash mod 64 over 500 distinct clip_ids — hundreds of collisions, some
  * needing the multi-round salt escalation), and the production wiring is
  * covered by running the whole pipeline with exactIds=true and requiring
  * bit-identical assignments to the default path (a collision-free corpus
  * must be a no-op). */
class ExactIdsSpec extends AnyFunSuite with SparkTest {

  // pmod 997 over 500 distinct clip_ids: ~125 birthday collisions plus
  // plenty of untouched singletons; weak ids live in [0, 997) while
  // re-keyed ids are uniform 64-bit (in-range by accident w.p. ~5e-17)
  private def weakIdFrame(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => CorpusGen.clipId(i.toLong)).toDF("clip_id")
      .withColumn("id", pmod(xxhash64(col("clip_id")), lit(997L)))
      .withColumn("payload", length(col("clip_id")))
  }

  test("repair makes weak-hash ids unique, keeps non-colliding ids, is deterministic") {
    val feats = weakIdFrame(500)
    val repaired = ExactIds.repair(feats)
    assert(repaired.columns.toSeq == feats.columns.toSeq)
    assert(repaired.count() == 500)
    assert(repaired.select("id").distinct().count() == 500)
    // a second run is bit-identical (pure function of the data)
    val again = ExactIds.repair(feats)
    assert(repaired.orderBy("clip_id").collect().toSeq ==
      again.orderBy("clip_id").collect().toSeq)
    // every weak id held by exactly one clip survived un-re-keyed
    val loneOriginals = feats.groupBy("id").count().where(col("count") === 1).count()
    assert(loneOriginals > 0 && loneOriginals < 500, "fixture needs both kinds")
    val kept = repaired.where(col("id").between(0L, 996L)).count()
    assert(kept == loneOriginals, "non-colliding ids must pass through untouched")
    // payload column rides along unchanged
    assert(repaired.where(col("payload") =!= length(col("clip_id"))).count() == 0)
  }

  test("collision-free input is returned as-is") {
    import spark.implicits._
    val feats = (0 until 200).map(i => CorpusGen.clipId(i.toLong)).toDF("clip_id")
      .withColumn("id", xxhash64(col("clip_id")))
    // same plan object back: the empty-collisions fast path adds nothing
    assert(ExactIds.repair(feats) eq feats)
  }

  test("pipeline with exactIds=true matches the default on a collision-free corpus") {
    val clips = CorpusGen.clips(spark, 300, seed = 42L).select("clip_id", "transcript")
    val base = DedupPipeline.run(clips, DedupConfig.default)
      .orderBy("clip_id").collect().toSeq
    val exact = DedupPipeline.run(clips, DedupConfig.default.copy(exactIds = true))
      .orderBy("clip_id").collect().toSeq
    assert(base == exact)
  }
}
