package graft.dedup

import graft.core.DedupConfig
import graft.sketch.FreqSketch
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * produced, and vice versa).
    *
    * Data-motion layout (the profile that drove it, BENCH r2 stage table):
    *  - the bucket table is materialized ONCE as packed (bkey, id) rows —
    *    lane index in the low 2 bits of the 64-bit key, so the wide shuffle
    *    carries 2 longs/row instead of 4 fields (~40% fewer shuffle bytes);
    *  - exact per-key counts are computed from that cache, and the SAME
    *    broadcast join that delivers hot-key salt counts also drops
    *    singleton buckets (count == 1) before the wide shuffle: a
    *    single-member bucket can never emit a pair, and at bench scale ~2/3
    *    of all bucket rows are singletons (random 64-bit band/fingerprint
    *    keys). Dropping them is provably recall-neutral and cuts the
    *    dominant shuffle + its sort CPU by the same factor;
    *  - the broadcast side is O(#keys with count>=2). At 10^12-row scale
    *    that can outgrow a broadcast: set `sketchHotKeys` and the pipeline
    *    falls back to salts-only broadcast (O(#hot keys), bounded by
    *    rows/cap) with no singleton drop — the documented extreme-scale
    *    path. */
  def pairs(buckets: Dataset[Bucket], cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val cap = cfg.maxBucketSize

    // lane bit -> 2-bit index packed into the key's low bits (keyspaces are
    // already lane-disjoint via the per-lane xor salt; the 2 bits lost to
    // the shift are hash bits — a cross-bucket collision merges two buckets,
    // which can only ADD candidates, all exactly verified downstream)
    val laneIdx = when($"lane" === lit(1), lit(0L))
      .when($"lane" === lit(2), lit(1L)).otherwise(lit(2L))
    val packed = buckets.toDF()
      .select(shiftleft($"key", 2).bitwiseOR(laneIdx).as("bkey"), $"id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // salt count for a key with `cnt` members: ceil-ish cnt/cap in [2, MaxSalts]
    def saltCount(cnt: Column): Column = greatest(lit(2L),
      least(lit(MaxSalts.toLong), (cnt / cap).cast("long") + 1L)).cast("int")

    // (bkey, salts) joined onto every bucket row. Exact path: one map-side-
    // combined count from the bucket cache; inner join on count>=2 keys
    // delivers salts AND drops singleton rows in the same broadcast probe.
    // Sketch path: O(k) driver bytes, salts-only, left join (keeps all rows).
    val salted =
      if (cfg.sketchHotKeys) {
        val saltsDf = hotKeysSketch(buckets, cap.toLong).toSeq.toDF("key", "ub")
          .select(shiftleft($"key", 2).bitwiseOR(lit(0L)).as("bkey0"), $"ub")
          // sketch keys carry no lane; rebuild the three packed variants
          .select(explode(array(lit(0L), lit(1L), lit(2L))).as("li"), $"bkey0", $"ub")
          .select($"bkey0".bitwiseOR($"li").as("bkey"), saltCount($"ub").as("salts"))
        packed.join(broadcast(saltsDf), Seq("bkey"), "left")
      } else {
        val multi = packed.groupBy($"bkey").count().where($"count" >= 2L)
          .select($"bkey",
            when($"count" >= cap.toLong, saltCount($"count")).as("salts"))
        packed.join(broadcast(multi), Seq("bkey"), "inner")
      }

    // pmod(murmur(id, bkey), salts) spreads a hot key's members over its
    // salt groups deterministically (a pure function of the row — identical
    // at any parallelism). skey re-mixes the salt into fresh high bits,
    // keeping the lane index recoverable from the low 2 bits.
    val withSkey = salted
      .withColumn("salt", when($"salts".isNull, lit(0)).otherwise(
        pmod(graft.functions.GraftFunctions.murmur3_pair($"id", $"bkey"),
          $"salts".cast("long")).cast("int")))
      .withColumn("skey", when($"salt" === 0, $"bkey").otherwise(
        graft.functions.GraftFunctions.murmur3_pair($"bkey", $"salt".cast("long"))
          .bitwiseAND(lit(~3L)).bitwiseOR($"bkey".bitwiseAND(lit(3L)))))

    // pairs within each skey group: typed groupByKey + flatMapGroups — a
    // sort-based shuffle of 2-long rows that streams each group once.
    // (The collect_list/ObjectHashAggregate alternative spent more task CPU
    // in SizeEstimator graph walks than in pair expansion; measured via
    // jstack sampling at local[32].) Groups are bounded by construction:
    // cold keys have < cap rows, hot keys are salted into ~cap-sized
    // sub-buckets, so the per-group id array is O(cap).
    val within = withSkey
      .select($"skey", $"id").as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (skey: Long, rows: Iterator[(Long, Long)]) =>
        val lane = 1 << (skey & 3L).toInt
        val ids = rows.map(_._2).toArray
        expand(ids, cap).map { case (a, b) => (a, b, lane) }
      }
      .toDF("a", "b", "lane")

    // chain stitching across salt groups of the same hot key: min-id per
    // (bkey, salt) via a map-side-combinable primitive hash agg over the
    // hot rows only (the broadcast probe filters before the agg, so the
    // shuffled partials are hot-keys-only, tiny), then per-bkey chains over
    // the salt-ordered reps.
    val chains = withSkey
      .where($"salts".isNotNull)
      .groupBy($"bkey", $"salt")
      .agg(min($"id").as("minId"))
      .groupBy($"bkey")
      .agg(sort_array(collect_list(struct($"salt", $"minId"))).as("reps"))
      .select($"bkey".bitwiseAND(lit(3L)).cast("int").as("li"), $"reps.minId".as[Array[Long]])
      .as[(Int, Array[Long])]
      .flatMap { case (li, reps) =>
        if (reps.length < 2) Iterator.empty
        else Iterator.range(0, reps.length - 1).map { i =>
          val x = reps(i); val y = reps(i + 1)
          (math.min(x, y), math.max(x, y), 1 << li)
        }
      }
      .toDF("a", "b", "lane")

    // lane = OR of the lane bits that produced the pair (verification then
    // evaluates only the clauses whose lane emitted it). fps_hits counts the
    // winnow-lane CO-EMISSIONS of the pair: under exact hot-key detection
    // every term (bucket membership, salt assignment, window adjacency) is a
    // pure function of the data, so the count is parallelism-independent and
    // safe to gate on. (Under sketchHotKeys the salt counts depend on
    // partition-order merge error — the gate must not be used there.)
    within.union(chains).where($"a" =!= $"b")
      .groupBy($"a", $"b")
      .agg(bit_or($"lane").as("lane"),
        sum(when($"lane" === lit(4), 1L).otherwise(0L)).as("fps_hits"))
  }
}
