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

  /** Overflow-degrade visibility (ADVICE r4): past `runBufferCap` a bucket
    * run drains through the bounded-memory windowed path and the advertised
    * "candidate recall COMPLETE below runBufferCap" property stops holding
    * for that run — the repo's no-silent-caps discipline requires that loss
    * to be machine-visible, not oral history. One named accumulator per
    * SparkContext counts overflowed runs across all pair-gen jobs; Bench and
    * Verify surface the value in their artifacts (expected 0 at every tested
    * scale — a single bucket needs ~10^5 members to trip it). */
  private val overflowAccs =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext,
      org.apache.spark.util.LongAccumulator]
  private[graft] def overflowAcc(sc: org.apache.spark.SparkContext): org.apache.spark.util.LongAccumulator =
    overflowAccs.computeIfAbsent(sc, c => c.longAccumulator("graft.pairs.overflowRuns"))
  /** Total overflowed runs observed on the session's context so far. */
  def overflowRuns(spark: SparkSession): Long = overflowAcc(spark.sparkContext).value

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

  /** Stitch the salt groups of one split hot bucket: every group minimum
    * pairs with the smallest minimum (a STAR, not a path). Same candidate
    * count as the old adjacent-rep chain, but the stitched component has
    * diameter 2 instead of #salts — for a bucket split into 1024 salt
    * groups the min-label CC loop previously needed O(log 1024) extra
    * pointer-jump rounds just to collapse the connector path; the star
    * collapses in one propagate. (Connectivity class is identical; which
    * CANDIDATE pairs are emitted differs, and all of them still pass
    * through exact verification like any other candidate.) */
  private def starChain(reps: Array[Long], lane: Int): Iterator[(Long, Long, Int)] = {
    if (reps.length < 2) return Iterator.empty
    var min = reps(0)
    var i = 1
    while (i < reps.length) { if (reps(i) < min) min = reps(i); i += 1 }
    val m = min
    reps.iterator.filter(_ != m).map(r => (math.min(m, r), math.max(m, r), lane))
  }

  /** Salted fallback for an over-cap run shared by the packed and keyed
    * paths: pmod-salted groups, window-capped expansion per group, star
    * stitch over the salt-ordered group minima. Extracted verbatim from the
    * packed path (the emitted pair set is a pure function of (bkey, arr, n,
    * cap) — unchanged by the move). */
  private def saltedRun(bkey: Long, lane: Int, arr: Array[Long], n: Int,
                        cap: Int): Iterator[(Long, Long, Int)] = {
    val salts = math.max(2L, math.min(MaxSalts.toLong, n.toLong / cap + 1L)).toInt
    val groups = Array.fill(salts)(new scala.collection.mutable.ArrayBuilder.ofLong)
    var i = 0
    while (i < n) {
      val id = arr(i)
      val h = graft.core.Murmur3.hashLong(id, bkey)
      val s = ((h % salts) + salts) % salts
      groups(s.toInt) += id
      i += 1
    }
    val built = groups.map(_.result()) // each ascending (input sorted)
    val pairsIt = built.iterator.flatMap { g =>
      expand(g, cap).map { case (a, b) => (a, b, lane) }
    }
    val reps = built.iterator.filter(_.nonEmpty).map(_.head).toArray
    pairsIt ++ starChain(reps, lane)
  }

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
    * Data-motion layout:
    *  - bucket rows travel as packed (bkey, id) 2-long rows — lane index
    *    in the low 2 bits of the 64-bit key;
    *  - the exact path ([[pairsPackedExact]]) moves them through ONE
    *    repartition-and-sort exchange and streams complete bucket runs per
    *    partition — counts, singleton drop, salting, expansion and chain
    *    stitching all happen inside that single pass;
    *  - `sketchHotKeys` selects the extreme-scale variant
    *    ([[pairsPackedSketch]]): Misra-Gries hot-key detection in O(k)
    *    driver bytes + salts-only broadcast, for corpora where even exact
    *    per-key counting is too much state. */
  def pairs(buckets: Dataset[Bucket], cfg: DedupConfig = DedupConfig.default): DataFrame = {
    import buckets.sparkSession.implicits._
    // lane bit -> 2-bit index packed into the key's low bits (keyspaces are
    // already lane-disjoint via the per-lane xor salt; the 2 bits lost to
    // the shift are hash bits — a cross-bucket collision merges two buckets,
    // which can only ADD candidates, all exactly verified downstream)
    val laneIdx = when($"lane" === lit(1), lit(0L))
      .when($"lane" === lit(2), lit(1L)).otherwise(lit(2L))
    pairsPacked(buckets.toDF()
      .select(shiftleft($"key", 2).bitwiseOR(laneIdx).as("bkey"), $"id"), cfg)
  }

  /** [[pairs]] over an already-packed (bkey, id) bucket table — the
    * production entry ([[DedupPipeline.candidates]] emits packed rows in
    * its single pass over the features cache). */
  def pairsPacked(packedIn: DataFrame, cfg: DedupConfig = DedupConfig.default): DataFrame =
    if (cfg.sketchHotKeys) pairsPackedSketch(packedIn, cfg)
    else pairsPackedExact(packedIn, cfg)

  /** Exact path: ONE exchange for the whole pair generation.
    *
    * `repartition(bkey) + sortWithinPartitions(bkey, id)` makes every
    * bucket a contiguous sorted run inside exactly one partition; a single
    * streaming pass over each partition then handles everything the old
    * three-exchange flow (per-key count shuffle, salt-delivery broadcast
    * join, salted data exchange, chain-stitch aggregation) did, with zero
    * further data motion and no driver round-trip:
    *
    *  - singleton runs emit nothing (the old count>=2 semi-join for free);
    *  - runs of 2..cap-1 ids emit all-pairs;
    *  - runs of >= cap ids are salted into ceil(n/cap) (clamped [2,
    *    MaxSalts]) groups by pmod(murmur(id, bkey), salts) — the same pure
    *    per-row function as before, so the emitted pair set (and the
    *    fps_hits co-emission counts the containment gate reads) is
    *    byte-identical to the old flow and independent of partitioning —
    *    each group expanded all-pairs/windowed, plus the chain pairs over
    *    the salt-ordered group minima that keep a split bucket connected;
    *  - runs longer than RunBuffer ids (~10^9-member buckets; cannot exist
    *    below cap*MaxSalts rows) switch to a bounded-memory streaming mode:
    *    salts saturates at MaxSalts (which is exact for any run this long),
    *    per-salt sliding windows of the ascending id stream emit the same
    *    windowed pairs, per-salt minima accumulate for the chains — O(
    *    MaxSalts * Window) memory however large the bucket.
    *
    * The sort is the shuffle's own ordering work (2-long rows); at 10^12
    * rows this is strictly less motion than the old flow shuffled for the
    * count alone. */
  private[dedup] def pairsPackedExact(packedIn: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = packedIn.sparkSession
    import spark.implicits._
    val cap = cfg.maxBucketSize
    // clamp (ADVICE r2): the overflow path pins salts = MaxSalts, which is
    // exact only when every overflow run has >= cap*MaxSalts members — so
    // the buffer must hold at least that many regardless of how callers
    // tune cap (Bench's graft.cap knob) or runBufferCap. At the default
    // config cap*MaxSalts == runBufferCap == 65536: behavior (and the gate
    // checksum) unchanged.
    val runBuffer = math.min(Int.MaxValue.toLong,
      math.max(cap.toLong * MaxSalts, cfg.runBufferCap.toLong)).toInt

    val ovAcc = overflowAcc(spark.sparkContext)
    val parts = packedIn
      .repartition(col("bkey"))
      .sortWithinPartitions(col("bkey"), col("id"))
      .select(col("bkey"), col("id")).as[(Long, Long)]

    val emitted = parts.mapPartitions { it0 =>
      val it = it0.buffered

      // one run = all rows of one bkey (contiguous, ids ascending)
      def processRun(): Iterator[(Long, Long, Int)] = {
        val bkey = it.head._1
        val lane = 1 << (bkey & 3L).toInt
        var arr = new Array[Long](16)
        var n = 0
        while (it.hasNext && it.head._1 == bkey && n < runBuffer) {
          if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
          arr(n) = it.next()._2
          n += 1
        }
        if (it.hasNext && it.head._1 == bkey) overflowRun(bkey, lane, arr, n)
        else if (n < 2) Iterator.empty
        else if (n < cap) expand(java.util.Arrays.copyOf(arr, n), cap)
          .map { case (a, b) => (a, b, lane) }
        else saltedRun(bkey, lane, arr, n, cap)
      }

      /** count > RunBuffer: bounded-memory streaming variant. salts is
        * pinned at MaxSalts — exact because runBuffer >= cap*MaxSalts (the
        * clamp above), so any overflowing run has saturated saltCount.
        * Groups always window-expand: expected group size is runBuffer /
        * MaxSalts >= cap. Residual approximation (ADVICE r2): a salt group
        * that lands *at or below* cap members would have gotten all-pairs
        * expansion in saltedRun but gets the window here; with window >=
        * cap/4 the chains keep recall (the skewed-fixture recall gate
        * covers the regime), and any TRUE giant bucket's groups are far
        * above cap anyway. */
      def overflowRun(bkey: Long, lane: Int, prefix: Array[Long], pn: Int): Iterator[(Long, Long, Int)] = {
        ovAcc.add(1L)
        val salts = MaxSalts
        val win = Window - 1
        val rings = Array.ofDim[Long](salts, win)
        val counts = new Array[Long](salts)
        val mins = new Array[Long](salts)
        val seen = new Array[Boolean](salts)
        val rest = new Iterator[Long] {
          def hasNext: Boolean = it.hasNext && it.head._1 == bkey
          def next(): Long = it.next()._2
        }
        val src = prefix.iterator.take(pn) ++ rest
        val windowed = src.flatMap { id =>
          val h = graft.core.Murmur3.hashLong(id, bkey)
          val s = (((h % salts) + salts) % salts).toInt
          if (!seen(s)) { seen(s) = true; mins(s) = id }
          val c = counts(s)
          val have = math.min(c, win.toLong).toInt
          val ring = rings(s)
          val out = Iterator.range(0, have).map { d =>
            val prev = ring(((c - 1 - d) % win).toInt)
            (math.min(prev, id), math.max(prev, id), lane)
          }
          ring((c % win).toInt) = id
          counts(s) = c + 1
          out
        }
        // chains built lazily AFTER the stream drains (++ is by-name)
        def chains: Iterator[(Long, Long, Int)] = {
          val reps = Iterator.range(0, salts).filter(seen(_)).map(mins(_)).toArray
          starChain(reps, lane)
        }
        windowed ++ chains
      }

      new Iterator[Iterator[(Long, Long, Int)]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[(Long, Long, Int)] = processRun()
      }.flatten
    }.toDF("a", "b", "lane")

    aggregatePairs(emitted)
  }

  /** Depth guard for [[expandHamming]]: beyond this the group degrades to
    * the salted-window fallback (data would have to be adversarially shaped
    * — each level strictly shrinks both the group and the unpinned mask). */
  final val MaxHamDepth = 16

  /** Round-robin the set bits of `m` into `k` disjoint submasks (each
    * nonempty when popcount(m) >= k). */
  private[dedup] def splitMask(m: Long, k: Int): Array[Long] = {
    val subs = new Array[Long](k)
    var i = 0
    var mm = m
    while (mm != 0L) {
      val b = java.lang.Long.lowestOneBit(mm)
      subs(i % k) |= b
      mm ^= b
      i += 1
    }
    subs
  }

  /** Recursive-pigeonhole expansion of one bucket run for EXACT
    * Hamming-<=maxHam candidate generation (HmSearch-style multi-level
    * splitting, done locally because the run carries each member's full
    * fingerprint).
    *
    * Invariant: all members agree on every fingerprint bit OUTSIDE `mask`
    * (level 0 pins the bucket's own block; each level pins one submask
    * more), so a pair's differing bits all lie inside `mask`.
    *
    *  - n <= cap: all-pairs — exact.
    *  - over cap with > maxHam VARYING unpinned bits: split those bits into
    *    maxHam+1 disjoint submasks and re-group by each submask's value. A
    *    pair with <= maxHam diffs has a diff-free submask (pigeonhole), so
    *    it lands intact in that submask's sub-group — recall-complete at
    *    every level, and each sub-group is strictly smaller because every
    *    submask contains a varying bit. Duplicate emissions across
    *    branches collapse in [[aggregatePairs]].
    *  - over cap with <= maxHam varying unpinned bits: EVERY pair already
    *    satisfies the fingerprint predicate (diffs <= varying <= maxHam) —
    *    a genuine fingerprint swarm. Degrade to the salted-window + star
    *    fallback: connectivity holds when the swarm is verification-
    *    homogeneous (members of a <=maxHam-diameter fp ball that also pass
    *    the secondary check), the documented boundary shared with the text
    *    lane's hub handling.
    *
    * This removes the recall leak the flat cap had: a low-entropy bucket
    * (e.g. the all-quiet audio block value 0, Theta(corpus)-sized and
    * heterogeneous) is re-split by the bits that distinguish its members
    * instead of windowed, so no true pair is lost to salting. */
  private def expandHamming(ids: Array[Long], fps: Array[Long], idx: Array[Int],
                            mask: Long, cap: Int, maxHam: Int, lane: Int,
                            bkey: Long, depth: Int): Iterator[(Long, Long, Int)] = {
    val n = idx.length
    if (n < 2) Iterator.empty
    else if (n <= cap) {
      for {
        i <- Iterator.range(0, n)
        j <- Iterator.range(i + 1, n)
      } yield {
        val a = ids(idx(i))
        val b = ids(idx(j))
        (math.min(a, b), math.max(a, b), lane)
      }
    } else {
      var varying = 0L
      val f0 = fps(idx(0))
      var i = 1
      while (i < n) { varying |= fps(idx(i)) ^ f0; i += 1 }
      val m = mask & varying
      if (java.lang.Long.bitCount(m) <= maxHam || depth >= MaxHamDepth) {
        val arr = new Array[Long](n)
        i = 0
        while (i < n) { arr(i) = ids(idx(i)); i += 1 }
        java.util.Arrays.sort(arr)
        saltedRun(bkey, lane, arr, n, cap)
      } else {
        splitMask(m, maxHam + 1).iterator.filter(_ != 0L).flatMap { sm =>
          val groups = scala.collection.mutable.LongMap
            .empty[scala.collection.mutable.ArrayBuilder.ofInt]
          var j = 0
          while (j < n) {
            val v = fps(idx(j)) & sm
            groups.getOrElseUpdate(v, new scala.collection.mutable.ArrayBuilder.ofInt) += idx(j)
            j += 1
          }
          groups.valuesIterator.flatMap { g =>
            expandHamming(ids, fps, g.result(), m & ~sm, cap, maxHam, lane, bkey, depth + 1)
          }
        }
      }
    }
  }

  /** Exact Hamming-join pair generation over (bkey, id, fp) bucket rows —
    * the keyed sibling of [[pairsPackedExact]] for predicates of the form
    * "Hamming(fp_a, fp_b) <= maxHam AND <secondary check>". Same
    * single-exchange layout (repartition + sortWithinPartitions, 3-long
    * rows, complete runs streamed per partition); over-cap runs recurse via
    * [[expandHamming]] instead of windowing, so candidate recall for the
    * Hamming budget is COMPLETE at any bucket size below `runBufferCap`
    * (beyond it the same bounded-memory windowed drain as the packed path
    * applies — a ~10^5-member single bucket, the documented boundary).
    *
    * `pinnedMask(bkey)` must return the fingerprint bits the level-0 bucket
    * key already pins (the pigeonhole block the row was emitted for). */
  def pairsHamming(packedIn: DataFrame, cfg: DedupConfig, maxHam: Int,
                   fullMask: Long, pinnedMask: Long => Long): DataFrame = {
    val spark = packedIn.sparkSession
    import spark.implicits._
    val cap = cfg.maxBucketSize
    val runBuffer = math.min(Int.MaxValue.toLong,
      math.max(cap.toLong * MaxSalts, cfg.runBufferCap.toLong)).toInt

    val ovAcc = overflowAcc(spark.sparkContext)
    val parts = packedIn
      .repartition(col("bkey"))
      .sortWithinPartitions(col("bkey"), col("id"))
      .select(col("bkey"), col("id"), col("fp")).as[(Long, Long, Long)]

    val emitted = parts.mapPartitions { it0 =>
      val it = it0.buffered

      def processRun(): Iterator[(Long, Long, Int)] = {
        val bkey = it.head._1
        val lane = 1 << (bkey & 3L).toInt
        var ids = new Array[Long](16)
        var fs = new Array[Long](16)
        var n = 0
        while (it.hasNext && it.head._1 == bkey && n < runBuffer) {
          if (n == ids.length) {
            ids = java.util.Arrays.copyOf(ids, ids.length << 1)
            fs = java.util.Arrays.copyOf(fs, fs.length << 1)
          }
          val r = it.next()
          ids(n) = r._2
          fs(n) = r._3
          n += 1
        }
        if (it.hasNext && it.head._1 == bkey) {
          // beyond runBuffer: bounded-memory windowed drain (ids only),
          // mirroring the packed path's overflowRun boundary. The drain
          // forfeits Hamming-recall completeness for THIS run — counted on
          // the overflow accumulator so the degrade is machine-visible
          // (ADVICE r4), never silent.
          ovAcc.add(1L)
          val salts = MaxSalts
          val win = Window - 1
          val rings = Array.ofDim[Long](salts, win)
          val counts = new Array[Long](salts)
          val mins = new Array[Long](salts)
          val seen = new Array[Boolean](salts)
          val rest = new Iterator[Long] {
            def hasNext: Boolean = it.hasNext && it.head._1 == bkey
            def next(): Long = it.next()._2
          }
          val src = ids.iterator.take(n) ++ rest
          val windowed = src.flatMap { id =>
            val h = graft.core.Murmur3.hashLong(id, bkey)
            val s = (((h % salts) + salts) % salts).toInt
            if (!seen(s)) { seen(s) = true; mins(s) = id }
            val c = counts(s)
            val have = math.min(c, win.toLong).toInt
            val ring = rings(s)
            val out = Iterator.range(0, have).map { d =>
              val prev = ring(((c - 1 - d) % win).toInt)
              (math.min(prev, id), math.max(prev, id), lane)
            }
            ring((c % win).toInt) = id
            counts(s) = c + 1
            out
          }
          def chains: Iterator[(Long, Long, Int)] = {
            val reps = Iterator.range(0, salts).filter(seen(_)).map(mins(_)).toArray
            starChain(reps, lane)
          }
          windowed ++ chains
        } else if (n < 2) Iterator.empty
        else expandHamming(java.util.Arrays.copyOf(ids, n),
          java.util.Arrays.copyOf(fs, n), Array.tabulate(n)(identity),
          fullMask & ~pinnedMask(bkey), cap, maxHam, lane, bkey, 0)
      }

      new Iterator[Iterator[(Long, Long, Int)]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[(Long, Long, Int)] = processRun()
      }.flatten
    }.toDF("a", "b", "lane")

    aggregatePairs(emitted)
  }

  /** Sketch path (the documented 10^12-row extreme: even the count>=2 key
    * set outgrows a broadcast): Misra-Gries hot keys, O(k) driver bytes,
    * salts-only broadcast, no singleton drop. */
  private[dedup] def pairsPackedSketch(packedIn: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = packedIn.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val cap = cfg.maxBucketSize

    val packed = packedIn.persist(StorageLevel.MEMORY_AND_DISK)

    // salt count for a key with `cnt` members: ceil-ish cnt/cap in [2, MaxSalts]
    def saltCount(cnt: Column): Column = greatest(lit(2L),
      least(lit(MaxSalts.toLong), (cnt / cap).cast("long") + 1L)).cast("int")

    // sketch directly over the packed keyspace (lanes are disjoint by
    // construction, so per-bkey hotness IS per-(key,lane) hotness)
    val partials: Array[Array[Byte]] = packed.select($"bkey").as[Long]
      .mapPartitions { it =>
        val sk = FreqSketch(4096)
        it.foreach(k => sk.update(k))
        Iterator.single(sk.serialize())
      }.collect()
    val merged = partials.foldLeft(FreqSketch(4096)) { (acc, bytes) =>
      acc.merge(FreqSketch.deserialize(bytes))
    }
    val hot = merged.frequentKeys(cap.toLong).map { case (k, _, _, ub) => (k, ub) }
    val saltsDf = hot.toSeq.toDF("bkey", "ub")
      .select($"bkey", saltCount($"ub").as("salts"))
    val salted = packed.join(broadcast(saltsDf), Seq("bkey"), "left")

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
      .flatMap { case (li, reps) => starChain(reps, 1 << li) }
      .toDF("a", "b", "lane")

    aggregatePairs(within.union(chains))
  }

  /** lane = OR of the lane bits that produced the pair (verification then
    * evaluates only the clauses whose lane emitted it). fps_hits counts the
    * winnow-lane CO-EMISSIONS of the pair: under exact hot-key detection
    * every term (bucket membership, salt assignment, window adjacency) is a
    * pure function of the data, so the count is parallelism-independent and
    * safe to gate on. (Under sketchHotKeys the salt counts depend on
    * partition-order merge error — the gate must not be used there.) */
  private def aggregatePairs(emitted: DataFrame): DataFrame = {
    import emitted.sparkSession.implicits._
    emitted.where($"a" =!= $"b")
      .groupBy($"a", $"b")
      .agg(bit_or($"lane").as("lane"),
        sum(when($"lane" === lit(4), 1L).otherwise(0L)).as("fps_hits"))
  }
}
