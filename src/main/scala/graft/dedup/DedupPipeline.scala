package graft.dedup

import graft.core.DedupConfig
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end near-duplicate detection + clustering pipeline
  * (SURVEY.md §2.2 P1-P11) over the input-hint-shaped clips table.
  *
  * Stages (all declarative DataFrame ops + custom expressions; Catalyst
  * prunes the audio `bytes` column out of every text stage automatically —
  * only `clip_id`/`transcript` are ever selected here):
  *
  *   clips ─ features (normalize, simhash, LSH bands, simhash blocks,
  *           winnow fingerprints; one pass, persisted)
  *         ─ three candidate lanes (MinHash-LSH ∪ SimHash-blocks ∪
  *           winnowing) through skew-aware [[CandidatePairs]]
  *         ─ exact verification with the shared [[DupPredicate]]
  *           (no false-positive pairs can survive)
  *         ─ [[ConnectedComponents]] min-label clustering
  *         ─ assignments + canonical representative per cluster.
  */
object DedupPipeline {

  /** Per-clip signature table: (clip_id, id, norm, simhash, bands, blocks,
    * fps) — one fused expression pass over the transcript (one normalize,
    * one shingle walk per family). Only clip_id/transcript are selected, so
    * Catalyst prunes the audio `bytes` column out of the scan. */
  def features(clips: DataFrame, cfg: DedupConfig = DedupConfig.default): DataFrame = {
    clips
      .select(col("clip_id"), text_signatures(col("transcript")).as("sig"))
      .select(
        col("clip_id"),
        hash_id(col("clip_id")).as("id"),
        col("sig.norm").as("norm"),
        col("sig.simhash").as("simhash"),
        col("sig.bands").as("bands"),
        col("sig.fps").as("fps"))
      .withColumn("blocks", simhash_block_keys(col("simhash")))
  }

  private def lane(features: DataFrame, arrayCol: String, cfg: DedupConfig): DataFrame = {
    import features.sparkSession.implicits._
    val buckets = features
      .select(explode(col(arrayCol)).as("key"), col("id"))
      .as[CandidatePairs.Bucket]
    CandidatePairs.pairs(buckets, cfg)
  }

  /** Union of the three candidate lanes, deduplicated. */
  def candidates(features: DataFrame, cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val lsh = lane(features, "bands", cfg)
    val sim = lane(features, "blocks", cfg)
    val fps = lane(features, "fps", cfg)
    lsh.union(sim).union(fps).distinct()
  }

  /** Exact verification of candidate pairs with the oracle-shared predicate,
    * in two passes:
    *  1. the expression pass (Hamming + exact Jaccard — cheap, codegen'd
    *     stage, no state);
    *  2. the substring-containment pass over the remainder: grouped by the
    *     container document and checked against a per-container suffix
    *     array built once per group ([[SuffixArray]]) — the "per-partition
    *     suffix-array pass" of the north rule. Identical semantics to
    *     `longer.contains(shorter)`, exactness preserved.
    */
  def verifiedEdges(features: DataFrame, cands: DataFrame,
                    cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val fa = features.select(col("id").as("a"), col("norm").as("norm_a"),
      col("simhash").as("sim_a"))
    val fb = features.select(col("id").as("b"), col("norm").as("norm_b"),
      col("simhash").as("sim_b"))
    val joined = cands
      .join(fa, "a")
      .join(fb, "b")
      .withColumn("fast", is_dup_fast(col("norm_a"), col("norm_b"), col("sim_a"), col("sim_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fastEdges = joined.where(col("fast")).select(col("a"), col("b"))
    val slow = joined.where(!col("fast") &&
      least(length(col("norm_a")), length(col("norm_b"))) >= cfg.minContainLen)
    fastEdges.union(containmentEdges(slow, cfg)).distinct()
  }

  /** The grouped suffix-array containment pass. Input rows carry
    * (a, b, norm_a, norm_b); pairs are oriented container→contained, grouped
    * by container id, and each group's candidates are searched in one
    * suffix array of the container text (built lazily — groups with a
    * single candidate use the direct scan, same result). */
  def containmentEdges(slowCands: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = slowCands.sparkSession
    import spark.implicits._
    val oriented = slowCands.select(
      when(length(col("norm_a")) >= length(col("norm_b")), col("a")).otherwise(col("b")).as("container"),
      when(length(col("norm_a")) >= length(col("norm_b")), col("b")).otherwise(col("a")).as("contained"),
      when(length(col("norm_a")) >= length(col("norm_b")), col("norm_a")).otherwise(col("norm_b")).as("container_norm"),
      when(length(col("norm_a")) >= length(col("norm_b")), col("norm_b")).otherwise(col("norm_a")).as("contained_norm"))
      .as[(Long, Long, String, String)]
    oriented
      .groupByKey(_._1)
      .flatMapGroups { (containerId, rows) =>
        val buf = rows.toArray
        val containerNorm = buf.head._3
        val sa = if (buf.length >= 4) SuffixArray.build(containerNorm) else null
        buf.iterator
          .filter { case (_, _, _, contained) =>
            if (sa != null) sa.contains(contained) else containerNorm.contains(contained)
          }
          .map { case (_, contained, _, _) =>
            if (containerId < contained) (containerId, contained) else (contained, containerId)
          }
      }
      .toDF("a", "b")
  }

  /** Full run: returns (clip_id, id, cluster, rep_clip_id, is_rep). `cluster`
    * is the min hash-id in the component; `rep_clip_id` the lexicographically
    * smallest clip_id in the cluster (deterministic canonical pick, P11). */
  def run(clips: DataFrame, cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val f = features(clips, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val cands = candidates(f, cfg)
    val edges = verifiedEdges(f, cands, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val labels = ConnectedComponents.run(edges, maxIter = 50)
    assignments(f, labels)
  }

  /** Join clip ids to CC labels; absent vertices are their own singleton
    * cluster. Canonical representative = min clip_id per cluster via a
    * map-side-combinable groupBy (no window sort over the whole corpus). */
  def assignments(features: DataFrame, labels: DataFrame): DataFrame = {
    val ids = features.select(col("clip_id"), col("id"))
    val withLabels = ids
      .join(labels.withColumnRenamed("label", "cc_label"), Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cc_label"), col("id")))
      .select(col("clip_id"), col("id"), col("cluster"))
    val reps = withLabels.groupBy(col("cluster"))
      .agg(min(col("clip_id")).as("rep_clip_id"))
    withLabels
      .join(reps, "cluster")
      .withColumn("is_rep", col("clip_id") === col("rep_clip_id"))
      .select(col("clip_id"), col("id"), col("cluster"), col("rep_clip_id"), col("is_rep"))
  }

  /** Surviving rows after dedup: one full input row per cluster (P11). */
  def dedupOutput(clips: DataFrame, assign: DataFrame): DataFrame =
    clips.join(assign.where(col("is_rep")).select(col("clip_id"), col("cluster")), "clip_id")
}
