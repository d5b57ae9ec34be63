package graft.streaming

import graft.SparkTest
import graft.core.Rng
import graft.functions.SketchAggregates._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's merge law (`FrequentItems.java:292-308`) makes the sketch
  * aggregates Structured-Streaming-ready by construction (SURVEY.md §2.3
  * "Streaming"): partial buffers merge across micro-batches exactly as they
  * merge across shuffle partitions. Proven here with a MemoryStream. */
class StreamingSpec extends AnyFunSuite with SparkTest {

  test("freq_sketch_topk aggregates across micro-batches (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val agg = input.toDF().toDF("key")
      .agg(freq_sketch_topk($"key", 1024, 5L).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.key".as("key"), $"h.est".as("est"))
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      val rng = Rng(13, 13)
      val batch1 = Array.fill(5000)(rng.nextZipf(100, 1.1).toLong)
      val batch2 = Array.fill(5000)(rng.nextZipf(100, 1.1).toLong)
      input.addData(batch1.toSeq)
      q.processAllAvailable()
      val after1 = spark.sql("select * from hh_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact1 = batch1.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
        .filter(_._2 >= 5)
      assert(after1 == exact1, "first micro-batch must match exact counts")

      input.addData(batch2.toSeq)
      q.processAllAvailable()
      val after2 = spark.sql("select * from hh_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact2 = (batch1 ++ batch2).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }.filter(_._2 >= 5)
      assert(after2 == exact2, "state must carry across micro-batches")
    } finally q.stop()
  }

  test("windowed event-time streaming aggregation with watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute"), $"key")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
      input.addData(Seq((t(0), 1L), (t(10), 1L), (t(70), 1L), (t(80), 2L)))
      q.processAllAvailable()
      val rows = spark.sql("select key, n from win_stream order by key, n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally q.stop()
  }
}
