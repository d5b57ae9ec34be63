package graft.dedup

import graft.core.DedupConfig
import graft.sketch.FreqSketch
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket → candidate-pair expansion with explicit skew handling.
  *
  * Input: rows of (key: Long, id: Long) — an LSH band bucket, a SimHash
  * block bucket, or a winnowing-fingerprint bucket. Output: unordered
  * candidate pairs (a, b), a < b.
  *
  * Skew machinery (SURVEY.md §2.2 P7): hot bucket keys are detected with the
  * Misra-Gries FreqSketch — the reference's `getFrequentKeys` heavy-hitter
  * query (`FrequencyEstimator.java:75`, `FrequentItems.java:311-332`) run as
  * a partial-aggregate (one tiny sketch per partition, merged on the driver,
  * `FrequentItems.java:292-308` merge law) so hot-key detection costs O(k)
  * driver bytes instead of a full per-key count shuffle. Hot keys are salted
  * into ceil(size/cap) sub-buckets; within each (key, salt) group pairs are
  * emitted all-pairs when small, sliding-window when large (bounding both
  * per-bucket pair count AND per-vertex degree — which is what keeps the
  * later CC joins hub-free); sub-buckets of a hot key are stitched with a
  * chain over their min ids so true giant clusters stay connected.
  */
object CandidatePairs {

  /** Per-vertex pairing window inside oversized buckets. */
  final val Window = 16
  /** Salt-group count bounds for hot keys. */
  final val MaxSalts = 1024

  final case class Bucket(key: Long, id: Long, lane: Int)

  /** Detect bucket keys with (estimated) multiplicity >= threshold using a
    * distributed-merged FreqSketch — one tiny partial sketch per partition,
    * O(k) driver bytes, no per-key shuffle. The 10^12-row path; estimates
    * near the threshold depend on partitioning (merge error), so the
    * default pipeline uses [[hotKeysExact]] for bit-determinism. */
  def hotKeysSketch(buckets: Dataset[Bucket], threshold: Long, sketchK: Int = 4096): Map[Long, Long] = {
    import buckets.sparkSession.implicits._
    val partials: Array[Array[Byte]] = buckets.select($"key").as[Long]
      .mapPartitions { it =>
        val sk = FreqSketch(sketchK)
        it.foreach(k => sk.update(k))
        Iterator.single(sk.serialize())
      }.collect()
    val merged = partials.foldLeft(FreqSketch(sketchK)) { (acc, bytes) =>
      acc.merge(FreqSketch.deserialize(bytes))
    }
    merged.frequentKeys(threshold).map { case (key, _, _, ub) => key -> ub }.toMap
  }

  /** Exact hot keys: map-side-combined count per key, filtered to the hot
    * tail before collect (the collected set is small by definition —
    * there are at most totalRows/threshold hot keys). */
  def hotKeysExact(buckets: Dataset[Bucket], threshold: Long): Map[Long, Long] = {
    import buckets.sparkSession.implicits._
    buckets.groupBy($"key").count()
      .where($"count" >= threshold)
      .as[(Long, Long)].collect().toMap
  }

  def hotKeys(buckets: Dataset[Bucket], threshold: Long,
              cfg: DedupConfig): Map[Long, Long] =
    if (cfg.sketchHotKeys) hotKeysSketch(buckets, threshold)
    else hotKeysExact(buckets, threshold)

  /** Expand sorted in-bucket ids to pairs: all-pairs when |ids| <= cap,
    * else sliding window of `Window` (bounded degree). */
  private def expand(ids: Array[Long], cap: Int): Iterator[(Long, Long)] = {
    java.util.Arrays.sort(ids)
    val m = ids.length
    if (m < 2) Iterator.empty
    else if (m <= cap) {
      for {
        i <- Iterator.range(0, m)
        j <- Iterator.range(i + 1, m)
      } yield (ids(i), ids(j))
    } else {
      for {
        i <- Iterator.range(0, m)
        d <- Iterator.range(1, math.min(Window, m - i))
      } yield (ids(i), ids(i + d))
    }
  }

  /** Full skew-aware pair generation. Output (a, b, lane): unordered unique
    * pairs with the OR of the lane bits that produced them — verification
    * then evaluates only the predicate clause(s) whose lane emitted a pair
    * (a jaccard check is pointless for a pair only the SimHash-block lane
    * produced, and vice versa). */
  def pairs(buckets: Dataset[Bucket], cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    val cap = cfg.maxBucketSize

    // Hot-key salt counts delivered as a broadcast-JOINED DataFrame — no
    // driver-side map sized by the hot-key count (at 10^12 rows an
    // adversarial corpus makes that a driver OOM), no per-row UDF. The
    // exact path never leaves the executors; the sketch path still collects
    // only O(k) sketch bytes. Salt formula unchanged from the collected-map
    // version: ceil-ish ub/cap clamped to [2, MaxSalts].
    val saltCount = greatest(lit(2L),
      least(lit(MaxSalts.toLong), ($"ub" / cap).cast("long") + 1L)).cast("int").as("salts")
    val saltsDf =
      if (cfg.sketchHotKeys)
        hotKeysSketch(buckets, cap.toLong).toSeq.toDF("key", "ub")
          .select($"key", saltCount)
      else
        buckets.groupBy($"key").count().where($"count" >= cap.toLong)
          .select($"key", $"count".as("ub"))
          .select($"key", saltCount)

    // pmod(murmur(id, key), salts) = the old Math.floorMod salt assignment
    // (identical values — determinism checksum preserved)
    val salted = buckets.toDF()
      .join(broadcast(saltsDf), Seq("key"), "left")
      .withColumn("salt", when($"salts".isNull, lit(0)).otherwise(
        pmod(graft.functions.GraftFunctions.murmur3_pair($"id", $"key"),
          $"salts".cast("long")).cast("int")))

    val saltedTyped = salted
      .select($"key", $"salt", $"lane", $"id")
      .as[(Long, Int, Int, Long)]

    // pairs within each (key, salt, lane) group: typed groupByKey +
    // flatMapGroups — a sort-based shuffle that streams each group once.
    // (The previous collect_list/ObjectHashAggregate version spent more task
    // CPU in SizeEstimator graph walks than in pair expansion; measured via
    // jstack sampling at local[32].) Groups are bounded by construction:
    // cold keys have < cap rows, hot keys are salted into ~cap-sized
    // sub-buckets, so the per-group id array is O(cap).
    val within = saltedTyped
      .groupByKey { case (key, salt, lane, _) => (key, salt, lane) }
      .flatMapGroups { (k: (Long, Int, Int), rows: Iterator[(Long, Int, Int, Long)]) =>
        val lane = k._3
        val ids = rows.map(_._4).toArray
        expand(ids, cap).map { case (a, b) => (a, b, lane) }
      }
      .toDF("a", "b", "lane")

    // chain stitching across salt groups of the same hot key: min-id per
    // (key, lane, salt) via a map-side-combinable primitive hash agg (the
    // input is the full bucket set but the output is hot-keys-only, tiny),
    // then per-(key, lane) chains over the salt-ordered reps.
    val chains = salted
      .where($"salts".isNotNull)
      .groupBy($"key", $"lane", $"salt")
      .agg(min($"id").as("minId"))
      .groupBy($"key", $"lane")
      .agg(sort_array(collect_list(struct($"salt", $"minId"))).as("reps"))
      .select($"lane", $"reps.minId".as[Array[Long]])
      .as[(Int, Array[Long])]
      .flatMap { case (lane, reps) =>
        if (reps.length < 2) Iterator.empty
        else Iterator.range(0, reps.length - 1).map { i =>
          val x = reps(i); val y = reps(i + 1)
          (math.min(x, y), math.max(x, y), lane)
        }
      }
      .toDF("a", "b", "lane")

    // lane = OR of the lane bits that produced the pair (verification then
    // evaluates only the clauses whose lane emitted it)
    within.union(chains).where($"a" =!= $"b")
      .groupBy($"a", $"b")
      .agg(bit_or($"lane").as("lane"))
  }
}
