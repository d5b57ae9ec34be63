package graft.corpus

import graft.core.Murmur3
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic embedding corpus for ANN benchmarks at scale
  * (VERDICT r3 #5: the sf embeddings table tops out at 2k vectors — recall
  * and plan shape need evidence at >= 1M).
  *
  * Shape mirrors the driver's embeddings table: (vec_id LONG,
  * embedding ARRAY<FLOAT>, label INT). Vectors are planted in clusters of
  * `clusterSize` around `n / clusterSize` centers: every coordinate is a
  * pure function of (seed, cluster, coord) + small per-member noise
  * ((seed, id, coord)), so generation is one embarrassingly parallel range
  * scan — no shuffle, no driver data path — and any row can be regenerated
  * for verification. Cluster-mates sit at cosine ~0.99 while unrelated
  * vectors are near-orthogonal, which makes exact top-k ground truth
  * cluster-internal — the realistic near-duplicate geometry the ANN lanes
  * exist for (same planted-cluster method as the audio corpus;
  * reference `experiment/make_data.py:28-33` "planted" stream).
  */
object EmbedGen {

  final val Dim = 64

  /** Uniform in [-1, 1) from a hash — same mapping as the hyperplane bank. */
  @inline private def u(h: Long): Float =
    ((h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0).toFloat

  def vectors(spark: SparkSession, n: Long, clusterSize: Int = 20,
              noise: Float = 0.1f, seed: Long = 42L,
              numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { id =>
      val cluster = id / clusterSize
      val emb = new Array[Float](Dim)
      var d = 0
      while (d < Dim) {
        val center = u(Murmur3.hashLong(cluster, seed + 9000L + d))
        val jitter = u(Murmur3.hashLong(id, seed + 9500L + d)) * noise
        emb(d) = center + jitter
        d += 1
      }
      (id, emb.toSeq, (cluster % Int.MaxValue).toInt)
    }.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding", "label")
  }

  /** Parquet-cached corpus under /tmp (generated once per config, reused
    * across bench rounds; version-keyed like the audio corpus cache). */
  def vectorsCached(spark: SparkSession, n: Long, clusterSize: Int = 20,
                    noise: Float = 0.1f, seed: Long = 42L): DataFrame = {
    val dir = s"/tmp/graft_embed_cache_v${CorpusGen.FormatVersion}_${n}_${clusterSize}_$seed"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      vectors(spark, n, clusterSize, noise, seed).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }
}
