package graft.ann

import graft.core.DedupConfig
import graft.dedup.{CandidatePairs, ConnectedComponents}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space near-duplicate CLUSTERING — the dedup semantic over an
  * embedding column, not just the pair list ([[graft.SparkEntry]] e03) or
  * top-k search ([[Ann]]).
  *
  * Same architecture as the text pipeline (SURVEY.md §2.2), swapping the
  * candidate generator: random-hyperplane LSH buckets feed the SAME
  * skew-aware [[CandidatePairs]] pair generation (single-exchange bucket
  * runs, hot-bucket salting, star chains) the text lanes ride, candidates
  * are verified with the exact codegen-native cosine predicate, and the
  * surviving edges cluster through the same [[ConnectedComponents]]
  * (min-label propagation, driver union-find below the gated edge count).
  * Cluster label = min vec_id of the component; the representative is the
  * label itself — deterministic and parallelism-independent.
  *
  * Scale contract (100 TB path): one scan emits all `tables` signatures
  * (array + posexplode — never `tables` re-scans); buckets travel as
  * (key, id) longs; embeddings are re-attached only to the deduped
  * candidate pairs. Recall is tuned by (planesPerTable, tables) exactly
  * like [[Ann.lshTopK]]: planesPerTable ~ log2(n / targetBucket) keeps
  * bucket collision mass bounded as n grows, at the cost of more tables
  * for the same recall. The driver-gate defaults (4 planes x 32 tables)
  * are geometry-matched to the sf embeddings table the same way e02's
  * parameters are (BASELINE.md round-4 ANN block): its near-dup pairs sit
  * barely above the 0.45 threshold (no planted structure), where a
  * same-bucket probability of (1 - acos(0.45)/pi)^4 = 0.177 per table
  * needs 32 independent tables for miss-all = 0.823^32 = 0.002/pair. */
object EmbedDedup {

  /** (vec_id, cluster, is_rep) for every input vector; singletons are their
    * own cluster. Exact predicate: cosine(a, b) >= threshold evaluated on
    * the full vectors (LSH is candidate generation only — a surviving edge
    * is never approximate). */
  def clusters(vectors: DataFrame, threshold: Double = 0.45,
               planesPerTable: Int = 4, tables: Int = 32, seed: Long = 42L,
               cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // clamp shuffle width to the input for the lane's eager section (pair
    // gen + verify + gating count + CC all run inside this call) — same
    // scale-adaptive rule as DedupPipeline.run / AudioDedup.run: a 2k-vector
    // query on a 32-partition session is mostly per-task fixed cost, while
    // at production row counts the clamp is a no-op. Results are
    // partitioning-independent (d10 oracle-gated).
    val pKey = "spark.sql.shuffle.partitions"
    val prevP = spark.conf.get(pKey)
    val p = math.max(2L, math.min(prevP.toLong, vectors.count() / 2000L + 1L))
    spark.conf.set(pKey, p.toString)
    try clustersInner(vectors, threshold, planesPerTable, tables, seed, cfg)
    finally spark.conf.set(pKey, prevP)
  }

  private def clustersInner(vectors: DataFrame, threshold: Double,
                            planesPerTable: Int, tables: Int, seed: Long,
                            cfg: DedupConfig): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val sigCols = (0 until tables).map(t =>
      hyperplane_sig(col("embedding"), planesPerTable, seed + t))
    val sigs = vectors.select(col("vec_id"),
      posexplode(array(sigCols: _*)).as(Seq("table", "bucket")))
    // one packed 64-bit bucket key per (table, sig): tables stay disjoint up
    // to a 64-bit coincidence, and a coincidence can only ADD candidates —
    // every pair is exactly verified below (same argument as the text
    // lanes' lane-salted keyspace, DedupPipeline.candidates)
    val buckets = sigs.select(
      murmur3_pair(col("bucket"), col("table").cast("long")).as("key"),
      col("vec_id").as("id"), lit(1).as("lane")).as[CandidatePairs.Bucket]
    val cand = CandidatePairs.pairs(buckets, cfg)

    val embA = vectors.select(col("vec_id").as("a"), col("embedding").as("a_emb"))
    val embB = vectors.select(col("vec_id").as("b"), col("embedding").as("b_emb"))
    // persisted BEFORE the gating count, mirroring DedupPipeline.run
    // (DedupPipeline.scala:323): without the pin, the count materializes
    // the whole LSH -> pair gen -> double embedding join -> cosine verify
    // chain and then runLocal's collect (or run's checkpointedSym)
    // re-executes it — at the 1M-vector scale run that re-ran ~9.5M-edge
    // cosine probes a second time (VERDICT r5 #2)
    val edges = cand.select(col("a"), col("b"))
      .join(embA, "a").join(embB, "b")
      .where(cosine_sim(col("a_emb"), col("b_emb")) >= threshold)
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // same small-graph gating as DedupPipeline.run: the driver union-find
    // is bit-identical to the distributed fixpoint (min of a component is
    // union-order-independent) and skips ~15 scheduler round-trips
    val labels =
      if (edges.count() <= cfg.ccLocalMaxEdges) ConnectedComponents.runLocal(edges)
      else ConnectedComponents.run(edges, maxIter = 50)
    // labels are materialized by here (runLocal collects; run checkpoints
    // each round) — the edge cache has served both consumers
    edges.unpersist(blocking = false)

    vectors.select(col("vec_id"))
      .join(labels.withColumnRenamed("id", "vec_id").withColumnRenamed("label", "lab"),
        Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("lab"), col("vec_id")))
      .withColumn("is_rep", col("vec_id") === col("cluster"))
      .select(col("vec_id"), col("cluster"), col("is_rep"))
  }
}
