package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas}
import graft.core.Tables
import graft.streaming.Streaming.{Event, Session}

class StreamingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val T0 = 1740000000L

  private def ev(id: Long, sec: Long, user: Long): Event =
    Event(id, ts(sec), user, "click", 1.0)

  test("watermarked windowed counts: closed windows emit, late data drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val counts = Streaming.windowedEventCounts(input.toDF(),
      windowLength = "1 hour", watermark = "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("wm_test").outputMode(OutputMode.Append()).start()
    try {
      // window [21:00, 22:00) gets two events; the 01:10 event pushes the
      // watermark past the window end so it closes and emits
      input.addData(ev(1, T0, 7), ev(2, T0 + 60, 7))  // 21:20, 21:21 UTC
      q.processAllAvailable()
      input.addData(ev(3, T0 + 4 * 3600, 7))          // 01:20 next day
      q.processAllAvailable()
      val closed = spark.table("wm_test")
        .select(unix_micros(col("window.start")), col("count"))
        .as[(Long, Long)].collect().toMap
      closed(1739998800L * 1000000L) shouldBe 2L
      // a late event behind the watermark must be ignored
      input.addData(ev(4, T0 + 120, 7))
      q.processAllAvailable()
      spark.table("wm_test")
        .select(sum(col("count"))).collect().head.getLong(0) shouldBe 2L
    } finally q.stop()
  }

  test("native session_window streaming: sessions MERGE across " +
    "micro-batches and emit once the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Streaming.sessionizeNative(
      input.toDF().withWatermark("ts", "10 minutes"))
    val q = sessions.writeStream.format("memory")
      .queryName("sw_test").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events 10 min apart — one open session
      input.addData(ev(1, T0, 7), ev(2, T0 + 600, 7))
      q.processAllAvailable()
      // batch 2: 25 min after the last event (inside the 30-min gap) —
      // must MERGE into the same session, not start a new one
      input.addData(ev(3, T0 + 600 + 1500, 7))
      q.processAllAvailable()
      spark.table("sw_test").count() shouldBe 0 // still open, nothing emits
      // far-future event advances the watermark past session end + gap
      input.addData(ev(4, T0 + 6 * 3600, 8))
      q.processAllAvailable()
      val emitted = spark.table("sw_test")
        .as[Session].collect().filter(_.user_id == 7L)
      emitted should have length 1 // ONE merged session, not three
      emitted.head.session_start_us shouldBe T0 * 1000000L
      emitted.head.session_end_us shouldBe (T0 + 2100) * 1000000L
      emitted.head.n_events shouldBe 3L
      // and it equals the batch derivation over the same events
      val batch = Streaming.sessionizeBatch(
        Seq(ev(1, T0, 7), ev(2, T0 + 600, 7), ev(3, T0 + 2100, 7))
          .toDF()).as[Session].collect()
      batch should contain theSameElementsAs Seq(emitted.head)
    } finally q.stop()
  }

  test("stateful sessionization: in-batch gap closes, timeout flushes the " +
    "open tail across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Streaming.sessionizeStream(input.toDS(),
      gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_test").outputMode(OutputMode.Append()).start()
    try {
      // user 42: two events 10 min apart (one session), then a 2-hour gap
      input.addData(ev(1, T0, 42), ev(2, T0 + 600, 42),
        ev(3, T0 + 7800, 42))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sess_test").as[Session].collect()
      afterBatch1.toSeq shouldBe Seq(
        Session(42, T0 * 1000000L, (T0 + 600) * 1000000L, 2))
      // a far-future event on ANOTHER user advances the watermark past
      // the open session's timeout → event-time timeout flushes it
      input.addData(ev(9, T0 + 100000, 99))
      q.processAllAvailable()
      val all = spark.table("sess_test").as[Session].collect()
      all should contain(
        Session(42, (T0 + 7800) * 1000000L, (T0 + 7800) * 1000000L, 1))
    } finally q.stop()
  }

  test("out-of-order above-watermark events extend a session backward " +
    "or close as their own earlier session — never corrupt the open one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Streaming.sessionizeStream(input.toDS(),
      gapMinutes = 30, watermark = "2 hours")
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_ooo_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, T0 + 3600, 7)) // open [T0+3600]
      q.processAllAvailable()
      // 10 min earlier, within the 30-min gap → extends BACKWARD
      input.addData(ev(2, T0 + 3000, 7))
      q.processAllAvailable()
      // 1h+ before the open session's start → its own earlier session,
      // emitted closed; the open session must stay intact
      input.addData(ev(3, T0, 7))
      q.processAllAvailable()
      spark.table("sess_ooo_test").as[Session].collect().toSeq shouldBe
        Seq(Session(7, T0 * 1000000L, T0 * 1000000L, 1))
      // far-future other-user event → timeout flushes the open session
      // with the backward-extended start and correct count
      input.addData(ev(9, T0 + 100000, 99))
      q.processAllAvailable()
      spark.table("sess_ooo_test").as[Session].collect() should contain(
        Session(7, (T0 + 3000) * 1000000L, (T0 + 3600) * 1000000L, 2))
    } finally q.stop()
  }

  test("two mutually-in-gap late events in one batch merge into ONE " +
    "earlier session, and a bridging event merges the chain into the " +
    "open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Streaming.sessionizeStream(input.toDS(),
      gapMinutes = 30, watermark = "6 hours")
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_pending_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, T0 + 10000, 7)) // open session at T0+10000
      q.processAllAvailable()
      // both events are >gap before the open session AND within the gap
      // of each other: batch semantics say ONE session of two events —
      // the old behavior emitted two singletons
      input.addData(ev(2, T0, 7), ev(3, T0 + 600, 7))
      q.processAllAvailable()
      spark.table("sess_pending_test").as[Session].collect().toSeq shouldBe
        Seq(Session(7, T0 * 1000000L, (T0 + 600) * 1000000L, 2))

      // user 8: same shape, but a third event bridges the pending chain
      // into the open session — everything merges, nothing emits early
      input.addData(ev(4, T0 + 4000, 8))
      q.processAllAvailable()
      input.addData(ev(5, T0, 8), ev(6, T0 + 900, 8), ev(7, T0 + 2400, 8))
      q.processAllAvailable()
      // far-future other-user event → timeout flushes user 8's single
      // merged session: [T0, T0+4000] with all 4 events
      input.addData(ev(9, T0 + 100000, 99))
      q.processAllAvailable()
      val user8 = spark.table("sess_pending_test").as[Session].collect()
        .filter(_.user_id == 8)
      user8.toSeq shouldBe Seq(
        Session(8, T0 * 1000000L, (T0 + 4000) * 1000000L, 4))
    } finally q.stop()
  }

  test("batch sessionization agrees with the streaming state machine on " +
    "closed sessions") {
    import spark.implicits._
    val events = Seq(
      ev(1, T0, 1), ev(2, T0 + 100, 1), ev(3, T0 + 5000, 1),
      ev(4, T0, 2), ev(5, T0 + 1000, 2))
    val batch = Streaming.sessionizeBatch(events.toDF())
      .as[Session].collect().toSet
    batch shouldBe Set(
      Session(1, T0 * 1000000L, (T0 + 100) * 1000000L, 2),
      Session(1, (T0 + 5000) * 1000000L, (T0 + 5000) * 1000000L, 1),
      Session(2, T0 * 1000000L, (T0 + 1000) * 1000000L, 2))
  }

  test("incremental formatted stream: processes only new drops per run") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val checkpoint = s"$lakeRoot/_checkpoints/ss"
    def drop(time: String): Unit = {
      val dir = new java.io.File(
        s"$lakeRoot/raw/velib/stations_status/20250219/$time")
      dir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(
          s"${BikeQueries.fixtureDir}/station_status.json"),
        java.nio.file.Paths.get(s"$dir/station_status.json"))
    }
    drop("120000")
    Streaming.ssStreamJob(spark, lakeRoot, checkpoint).awaitTermination()
    val out = s"$lakeRoot/formatted_stream/velib/stations_status/"
    spark.read.parquet(out).count() shouldBe 8
    // second drop → incremental append, first file not reprocessed
    drop("150000")
    Streaming.ssStreamJob(spark, lakeRoot, checkpoint).awaitTermination()
    spark.read.parquet(out).count() shouldBe 16
    spark.read.parquet(out).schema.fields.map(_.name).toSeq shouldBe
      BikeSchemas.ssFormatted.fields.map(_.name).toSeq
  }

  test("stream-stream interval join: in-window views match across " +
    "batches, out-of-window views never do") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = Streaming.streamStreamJoin(
      clicks.toDF(), views.toDF(), toleranceMinutes = 60)
    val q = joined.writeStream.format("memory")
      .queryName("ssj_test").outputMode(OutputMode.Append()).start()
    try {
      views.addData(ev(1, T0, 7), ev(2, T0 - 7200, 7)) // in/out of window
      q.processAllAvailable()
      // the click arrives in a LATER batch: the view must still be
      // buffered in join state and match (exactly once — sorted compare
      // so a duplicate emission cannot hide in a set)
      clicks.addData(ev(10, T0 + 600, 7))
      q.processAllAvailable()
      spark.table("ssj_test").select($"click_id", $"view_id")
        .as[(Long, Long)].collect()
        .sorted shouldBe Array((10L, 1L)) // 2h-old view outside tolerance
      // EVICTION: far-future events on BOTH sides push the global
      // watermark past the old view's liveness bound (view_ts +
      // tolerance + delay), so its buffered state is dropped — a
      // subsequent click that would have matched it emits nothing
      views.addData(ev(3, T0 + 100000, 99))
      clicks.addData(ev(11, T0 + 100000, 98))
      q.processAllAvailable()
      clicks.addData(ev(12, T0 + 600, 7)) // below watermark now
      q.processAllAvailable()
      spark.table("ssj_test").select($"click_id", $"view_id")
        .as[(Long, Long)].collect()
        .sorted shouldBe Array((10L, 1L)) // no resurrection of evicted state
    } finally q.stop()
  }

  test("left-outer interval join: unmatched clicks emit null views only " +
    "after the watermark closes their window; matched clicks never " +
    "emit a null duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = Streaming.streamStreamJoinOuter(
      clicks.toDF(), views.toDF(), toleranceMinutes = 60)
    val q = joined.writeStream.format("memory")
      .queryName("ssjo_test").outputMode(OutputMode.Append()).start()
    try {
      views.addData(ev(1, T0, 7))
      clicks.addData(ev(10, T0 + 600, 7), // matches view 1
        ev(11, T0 + 600, 8)) // no view for user 8 — candidate null row
      q.processAllAvailable()
      // watermark has not moved past click 11 yet: its window is still
      // open, so ONLY the matched row may have been emitted
      spark.table("ssjo_test").select($"click_id", $"view_id")
        .as[(Long, Option[Long])].collect().toSet shouldBe
        Set((10L, Some(1L)))
      // far-future events on both sides advance the watermark past
      // click 11 → its state evicts and the null row emits; click 10
      // must NOT additionally emit a null row (it matched)
      views.addData(ev(2, T0 + 100000, 99))
      clicks.addData(ev(12, T0 + 100000, 98))
      q.processAllAvailable()
      val rows = spark.table("ssjo_test").select($"click_id", $"view_id")
        .as[(Long, Option[Long])].collect().toSet
      rows should contain((11L, None))
      rows should not contain ((10L, None))
    } finally q.stop()
  }

  test("observed watermark lag: each batch reports max event time vs the " +
    "engine watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new Streaming.LagListener
    spark.streams.addListener(listener)
    val input = MemoryStream[Event]
    val counts = Streaming.windowedEventCounts(
      Streaming.withObservedLag(input.toDF()),
      windowLength = "1 hour", watermark = "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("lag_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, T0, 7))
      q.processAllAvailable()
      input.addData(ev(2, T0 + 7200, 7))
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (listener.lags.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val lags = listener.lags
      lags.size should be >= 2
      lags.map(_.maxEventTsUs).max shouldBe (T0 + 7200) * 1000000L
      // second batch: watermark = first batch's max event time − 1 h, so
      // observed lag = event-time head − watermark = 2 h advance + 1 h
      // delay = 3 h
      val second = lags.find(_.maxEventTsUs == (T0 + 7200) * 1000000L).get
      second.watermarkMs shouldBe (T0 - 3600) * 1000L
      second.lagMs shouldBe (7200 + 3600) * 1000L
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("streaming dedup: a duplicate re-delivered in a later batch " +
    "within the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = Streaming.dedupStream(input.toDF(), watermark = "2 hours")
    val q = out.writeStream.format("memory")
      .queryName("sdd_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, T0, 7), ev(1, T0, 7)) // in-batch duplicate
      q.processAllAvailable()
      input.addData(ev(1, T0, 7), ev(2, T0 + 60, 7)) // cross-batch dup
      q.processAllAvailable()
      spark.table("sdd_test").select($"event_id").as[Long]
        .collect().sorted shouldBe Array(1L, 2L)
    } finally q.stop()
  }

  test("st1/st2 streaming queries run to completion on the test tables") {
    val st1 = StreamingQueries.st1WindowedCounts(spark, "/root/testdata/sf0.001")
    st1.count() should be > 0L
    val st2 = StreamingQueries.st2SessionizeBatch(spark, "/root/testdata/sf0.001")
    st2.count() should be > 0L
    // session invariant: Σ n_events == total events
    st2.agg(sum(col("n_events"))).collect().head.getLong(0) shouldBe
      Tables.events(spark, "/root/testdata/sf0.001").count()
  }
}
