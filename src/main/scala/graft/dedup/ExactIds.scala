package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact 64-bit clip-id guarantee (VERDICT r3 #7).
  *
  * The pipeline keys every shuffle on `id = hash64(clip_id)`. At 10^12 rows
  * the birthday mass of a 64-bit hash is ~3e4 expected collisions, and one
  * collision silently merges two unrelated clips into a single graph vertex
  * (a false dedup). The obvious widening — a two-column (hi, lo) id — was
  * rejected on scale grounds: [[CandidatePairs]] packs (bucket, id) into
  * single longs through the hottest shuffle and sorts them as primitives,
  * so doubling id width doubles the pipeline's dominant data motion for an
  * event with ~1e-8 per-row probability. Instead this pass makes the 64-bit
  * id EXACT for the price of one slim map-side-combinable aggregation:
  *
  *  1. detect: group (id, hi) where `hi` is an independent second 64-bit
  *     hash of clip_id; an id whose group holds two distinct `hi` values is
  *     a collision (the residual blind spot is a simultaneous collision of
  *     BOTH hashes — a 128-bit event, ~1e-15 at 10^12 rows — versus ~3e-5
  *     for the undetected-collision status quo);
  *  2. repair: the colliding ids (a broadcast-size set by construction —
  *     far above its expectation the input is not the contract's
  *     unique-clip_id table and the pass fails loudly rather than guess)
  *     are re-keyed with a salted re-hash of clip_id, deterministically:
  *     ties and salt escalation depend only on the data, never on
  *     partitioning;
  *  3. verify: re-keyed ids are checked against BOTH each other (driver-
  *     side, the set is tiny) and all surviving ids (one broadcast
  *     semi-join scan); clashes escalate the salt and loop. Each round is
  *     a ~n·(colliding/2^64) thinning, so round 2 is already vanishingly
  *     rare; `maxRounds` bounds the loop and overflow fails loudly.
  *
  * Off by default (`DedupConfig.exactIds`): the detection aggregation is
  * one extra full-corpus shuffle of 16-byte rows, and every oracle/checksum
  * gate runs the 64-bit default. Reference analogue: none — the reference
  * engines key on raw string ids and never face the problem; this is the
  * price of the compact-id optimization, paid where it's created.
  */
object ExactIds {

  private val HiSalt = "graft/id-hi"
  private val ReKeySalt = "graft/id-rekey"

  /** Repair `id` collisions in a frame carrying (clip_id: String, id: Long)
    * so that distinct clip_ids end with distinct ids. All other columns and
    * all non-colliding ids pass through untouched. Deterministic: output is
    * a pure function of the (clip_id, id) data. */
  def repair(feats: DataFrame, maxRounds: Int = 4,
             maxCollisions: Int = 1 << 20): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._

    val withHi = feats.select(col("clip_id"), col("id"),
      xxhash64(col("clip_id"), lit(HiSalt)).as("hi"))
    // an id is colliding iff it is shared by >= 2 distinct clip_ids
    // (distinct hi); min/max(hi) is map-side combinable, so the only data
    // motion is the combined (id, hi, hi) partials
    val colliding = withHi.groupBy(col("id"))
      .agg(min(col("hi")).as("mn"), max(col("hi")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("id"))
      .persist()
    try {
      if (colliding.isEmpty) return feats

      val victims = withHi.join(broadcast(colliding), Seq("id"))
        .select(col("clip_id")).as[String].take(maxCollisions + 1)
      require(victims.length <= maxCollisions,
        s"ExactIds: more than $maxCollisions colliding clip ids — at 64-bit " +
          "birthday rates this input cannot be a unique-clip_id table; refusing to re-key it")

      // ids that survive as-is; re-keyed ids must not land on any of them
      val surviving = feats.join(broadcast(colliding), Seq("id"), "left_anti")

      // deterministic salted re-key loop
      val accepted = scala.collection.mutable.HashMap.empty[String, Long]
      var unresolved: Seq[String] = victims.sorted.toSeq
      var round = 0
      while (unresolved.nonEmpty && round < maxRounds) {
        val cand = unresolved.map { cid =>
          cid -> graft.core.Murmur3.hashString(cid, graft.core.Murmur3
            .hashString(ReKeySalt, round.toLong))
        }
        // internal uniqueness: first (clip_id-sorted) claimant keeps the
        // value; later claimants and clashes with already-accepted values
        // escalate to the next salt
        val taken = scala.collection.mutable.HashSet.empty[Long]
        accepted.values.foreach(taken += _)
        val (ok, dup) = cand.partition { case (_, nid) =>
          if (taken.contains(nid)) false else { taken += nid; true }
        }
        // external uniqueness: one broadcast semi-join scan over the
        // surviving ids; any hit sends ITS claimants to the next salt
        val candDf = ok.map(_._2).toDF("id")
        val clashes = surviving.join(broadcast(candDf), Seq("id"), "left_semi")
          .select(col("id")).distinct().as[Long].collect().toSet
        val (bad, good) = ok.partition { case (_, nid) => clashes.contains(nid) }
        good.foreach { case (cid, nid) => accepted(cid) = nid }
        unresolved = (dup ++ bad).map(_._1).sorted
        round += 1
      }
      if (unresolved.nonEmpty)
        throw new IllegalStateException(
          s"ExactIds: ${unresolved.size} clip ids still colliding after $maxRounds salts")

      val mapDf = broadcast(accepted.toSeq.toDF("clip_id", "graft_new_id"))
      feats.join(mapDf, Seq("clip_id"), "left")
        .withColumn("id", coalesce(col("graft_new_id"), col("id")))
        .drop("graft_new_id")
        .select(feats.columns.map(col).toIndexedSeq: _*)
    } finally colliding.unpersist(blocking = false)
  }
}
