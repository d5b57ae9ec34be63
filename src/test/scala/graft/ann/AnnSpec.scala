package graft.ann

import graft.SparkTest
import graft.core.Rng
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite with SparkTest {

  /** Deterministic clustered embeddings: 20 centers, unit-ish noise. */
  private lazy val vectors = {
    import spark.implicits._
    val rng = Rng(11, 11)
    val dim = 32
    val centers = Array.fill(20, dim)(rng.nextDoubleIn(-1, 1).toFloat)
    val rows = (0 until 400).map { i =>
      val c = centers(i % 20)
      val v = c.map(x => x + rng.nextDoubleIn(-0.15, 0.15).toFloat)
      (i.toLong, v.toSeq)
    }
    spark.createDataset(rows).toDF("vec_id", "embedding")
  }

  test("brute-force top-k: neighbors dominated by same center") {
    val res = Ann.bruteForceTopK(vectors.where("vec_id < 40"), vectors, 3).collect()
    assert(res.length == 40 * 3)
    val sameCenter = res.count(r => r.getLong(0) % 20 == r.getLong(1) % 20)
    assert(sameCenter.toDouble / res.length >= 0.95,
      s"only $sameCenter/${res.length} neighbors share the planted center")
  }

  test("IVF top-k recalls most exact top-k pairs (probing 1/4 of the cells)") {
    val queries = vectors.where("vec_id % 10 = 0")
    val exact = Ann.bruteForceTopK(queries, vectors, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(queries, vectors, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall vs exact = $recall")
    assert(recall >= 0.8, s"IVF ANN recall $recall < 0.8")
  }

  test("LSH top-k recalls most exact top-k pairs") {
    val exact = Ann.bruteForceTopK(vectors, vectors, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(vectors, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"LSH recall vs exact = $recall")
    assert(recall >= 0.8, s"LSH ANN recall $recall < 0.8")
  }
}
