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

  test("flatMapGroupsWithState sessionization: gap split, cross-batch state, timeout flush") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = input.toDF().toDF("user_id", "ts")
    val out = Sessionize.sessionizeDF(events, gapSec = 60, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events 10s apart (one session so far);
      // user 2 one event
      input.addData(Seq((1L, t(0)), (1L, t(10)), (2L, t(5))))
      q.processAllAvailable()
      // batch 2: user 1 event 200s later -> closes the first session (gap
      // 60s exceeded) and opens a second; the watermark (= max event time)
      // also passes user 2's last+gap, flushing user 2 via timeout
      input.addData(Seq((1L, t(210))))
      q.processAllAvailable()
      // batch 3: push the watermark far ahead so every open session times out
      input.addData(Seq((3L, t(1000))))
      q.processAllAvailable()
      input.addData(Seq((3L, t(2000))))
      q.processAllAvailable()
      val rows = spark.sql(
        "select user_id, start_ms, end_ms, n_events from sess_stream order by user_id, start_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      def ms(s: Long) = 1700000000000L + s * 1000
      assert(rows.contains((1L, ms(0), ms(10), 2L)), s"user1 first session missing: $rows")
      assert(rows.contains((1L, ms(210), ms(210), 1L)), s"user1 second session missing: $rows")
      assert(rows.contains((2L, ms(5), ms(5), 1L)), s"user2 session missing: $rows")
    } finally q.stop()
  }

  test("sessionization merges late-but-within-watermark events without regressing last_ms") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    def ms(s: Long) = 1700000000000L + s * 1000
    val events = input.toDF().toDF("user_id", "ts")
    // generous watermark: nothing is dropped, late events reach the operator
    val out = Sessionize.sessionizeDF(events, gapSec = 60, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sess_late_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 open session [100, 130]; user 2 event at 1000
      input.addData(Seq((1L, t(100)), (1L, t(130)), (2L, t(1000))))
      q.processAllAvailable()
      // batch 2 (ADVICE r2 scenario): user 1 gets a LATE event at 80 —
      // within the gap before the open session's start. It must merge
      // (start extends back to 80, last stays 130, n -> 3); the old code
      // set last_ms back to 80 and mis-split the next event. user 2 gets
      // an ULTRA-late event at 500 (> gap before its open session) which
      // closes immediately as a singleton.
      input.addData(Seq((1L, t(80)), (2L, t(500))))
      q.processAllAvailable()
      // batch 3: user 1 event at 150 — within gap of last=130, so STILL the
      // same session (the buggy version had last=80 and split here)
      input.addData(Seq((1L, t(150))))
      q.processAllAvailable()
      // batch 4: far-future event closes user 1's session via gap split
      input.addData(Seq((1L, t(5000))))
      q.processAllAvailable()
      val rows = spark.sql(
        "select user_id, start_ms, end_ms, n_events from sess_late_stream order by user_id, start_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows.contains((1L, ms(80), ms(150), 4L)), s"merged late session wrong: $rows")
      assert(rows.contains((2L, ms(500), ms(500), 1L)), s"ultra-late singleton missing: $rows")
      assert(!rows.exists(r => r._1 == 1L && r._3 < r._2), s"end < start emitted: $rows")
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
