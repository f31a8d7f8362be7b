package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Tables

/** Correctness-gate entries for the streaming operators. Streaming plans
  * run to completion via AvailableNow + memory sink, so the driver's
  * batch oracle can check the final state. */
object StreamingQueries {

  /** One staged directory per source dir for the whole JVM: the file
    * stream source wants a directory and the test table is a bare file.
    * Staging is a hard link where the filesystem allows it (no byte
    * copy), falling back to a copy, and is memoized so repeated gate/
    * bench invocations don't leak a table copy per call. */
  private val stagedEvents =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val dir = stagedEvents.computeIfAbsent(d, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-events-stream")
      val src = java.nio.file.Paths.get(s"$d/events.parquet")
      val dst = tmp.resolve("events.parquet")
      try java.nio.file.Files.createLink(dst, src)
      catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
      tmp.toString
    })
    val schema = s.read.parquet(s"$d/events.parquet").schema
    graft.core.Tables.normalizeEventTs(
      s.readStream.schema(schema).parquet(dir))
  }

  /** st1 — watermarked tumbling-window counts, driven as a stream and
    * checked against a batch GROUP BY in DuckDB (complete mode ⇒ the
    * final table equals the batch answer exactly). */
  def st1WindowedCounts(s: SparkSession, d: String): DataFrame =
    Streaming.runToMemory(s,
      Streaming.windowedEventCounts(eventsStream(s, d)),
      "st1_windowed_counts_tbl", OutputMode.Complete())
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("count").as("n"))

  val st1Oracle: String =
    """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
      |    AS window_start_us,
      |  event_type, count(*) AS n
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** st2 — batch sessionization (gaps-and-islands), fully oracle-checked. */
  def st2SessionizeBatch(s: SparkSession, d: String): DataFrame =
    Streaming.sessionizeBatch(Tables.events(s, d))

  val st2Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |marks AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
      |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |ids AS (
      |  SELECT user_id, ts_us,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marks)
      |SELECT user_id, min(ts_us) AS session_start_us,
      |  max(ts_us) AS session_end_us, count(*) AS n_events
      |FROM ids GROUP BY user_id, session_id""".stripMargin

  /** st3 — the stateful streaming sessionizer, gated as a stream ≡ batch
    * EQUALITY: the stream runs to completion (AvailableNow ⇒ one data
    * batch closing in-batch-gap sessions, then a final batch whose
    * advanced watermark fires event-time timeouts), and its emitted
    * sessions are compared in-engine against [[Streaming.sessionizeBatch]]
    * minus the tails the state machine legitimately still holds open — a
    * user's LAST session whose timeout (end ms + gap) has not passed the
    * final watermark (max event ms − delay). The output row is
    * `(n_emitted, n_stream_only, n_batch_missing)` where both EXCEPT-ALL
    * counts must be 0 and n_emitted is re-derived independently by the
    * DuckDB oracle — a hash-exact gate over the stateful operator, not a
    * rows-only cardinality check. Cross-batch state and out-of-order
    * merging are additionally pinned in StreamingSpec with a multi-batch
    * MemoryStream. */
  def st3SessionizeStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val typed = eventsStream(s, d).as[Streaming.Event]
    val stream = Streaming.runToMemory(s,
      Streaming.sessionizeStream(typed).toDF(),
      "st3_sessionize_tbl", OutputMode.Append())
      .select("user_id", "session_start_us", "session_end_us", "n_events")
    val ev = Tables.events(s, d)
    val sess = Streaming.sessionizeBatch(ev)
    // final watermark in ms, exactly as the engine computes it: max event
    // time truncated to ms, minus the 1-hour delay. Integral `div` — a
    // double division of a 1.7e15 us epoch can round across the boundary.
    val wm = ev.agg(expr("(max(unix_micros(ts)) div 1000) - 3600000")
      .as("wm_ms"))
    val w = Window.partitionBy(col("user_id"))
    // persisted: expected feeds BOTH EXCEPT-ALL directions — without the
    // persist the batch sessionization (window + agg over all events)
    // runs twice
    val expected = graft.core.TransientCache.persist(sess
      .withColumn("__last_start", max(col("session_start_us")).over(w))
      .crossJoin(broadcast(wm))
      .filter(!(col("session_start_us") === col("__last_start") &&
        expr("(session_end_us div 1000) + 1800000") >= col("wm_ms")))
      .select("user_id", "session_start_us", "session_end_us", "n_events"))
    stream.agg(count(lit(1)).as("n_emitted"))
      .crossJoin(stream.exceptAll(expected)
        .agg(count(lit(1)).as("n_stream_only")))
      .crossJoin(expected.exceptAll(stream)
        .agg(count(lit(1)).as("n_batch_missing")))
  }

  /** DuckDB re-derives the emitted-session count from the batch
    * gaps-and-islands form plus the timeout model; the two EXCEPT-ALL
    * columns assert in-engine set equality and must be zero. */
  val st3Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |marks AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
      |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |ids AS (
      |  SELECT user_id, ts_us,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marks),
      |sess AS (
      |  SELECT user_id, min(ts_us) AS session_start_us,
      |    max(ts_us) AS session_end_us, count(*) AS n_events
      |  FROM ids GROUP BY user_id, session_id),
      |wm AS (SELECT max(ts_us)//1000 - 3600000 AS wm_ms FROM e),
      |last AS (
      |  SELECT user_id, max(session_start_us) AS last_start
      |  FROM sess GROUP BY user_id),
      |open_tails AS (
      |  SELECT s.* FROM sess s
      |  JOIN last t ON s.user_id = t.user_id
      |    AND s.session_start_us = t.last_start
      |  WHERE s.session_end_us//1000 + 1800000 >= (SELECT wm_ms FROM wm))
      |SELECT
      |  CAST((SELECT count(*) FROM sess) -
      |       (SELECT count(*) FROM open_tails) AS BIGINT) AS n_emitted,
      |  CAST(0 AS BIGINT) AS n_stream_only,
      |  CAST(0 AS BIGINT) AS n_batch_missing""".stripMargin

  /** st4 — watermarked stream-stream interval join, driven to
    * completion (one AvailableNow batch ⇒ the full join result; the
    * multi-batch concerns — cross-batch buffering and watermark-driven
    * state eviction — are pinned in StreamingSpec). The
    * DuckDB oracle is the equivalent batch interval join. */
  def st4StreamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    Streaming.runToMemory(s,
      Streaming.streamStreamJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view")),
      "st4_stream_join_tbl", OutputMode.Append())
  }

  val st4Oracle: String =
    """SELECT c.event_id AS click_id, c.user_id,
      |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
      |  v.event_id AS view_id,
      |  epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_ts_us
      |FROM events c JOIN events v
      |  ON c.user_id = v.user_id
      |  AND c.event_type = 'click' AND v.event_type = 'view'
      |  AND epoch_us(CAST(v.ts AS TIMESTAMP))
      |    BETWEEN epoch_us(CAST(c.ts AS TIMESTAMP)) - 3600000000
      |    AND epoch_us(CAST(c.ts AS TIMESTAMP))""".stripMargin

  /** st5 — watermarked streaming dedup over a stream that re-delivers
    * every event twice (self-union of the source, the at-least-once
    * shape); the final table must equal the batch DISTINCT. */
  def st5StreamDedup(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    Streaming.runToMemory(s,
      Streaming.dedupStream(ev.unionByName(eventsStream(s, d))),
      "st5_stream_dedup_tbl", OutputMode.Append())
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }

  val st5Oracle: String =
    """SELECT DISTINCT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  user_id, event_type, value, props
      |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)""".stripMargin

  /** st6 — the LEFT-OUTER watermarked interval join: st4's matched rows
    * plus every click the watermark has proven unmatched, with null view
    * fields. The null emissions come from state eviction, so the oracle
    * re-derives the eviction model: a click is declared unmatched iff it
    * has no view in its window AND the final watermark — min of the two
    * sides' (max event ms − 1 h), Spark's multipleWatermarkPolicy=min —
    * has passed its event time. Clicks still inside the watermark
    * horizon are held in state and legitimately absent from both sides.
    * Multi-batch buffering/eviction behavior is pinned in StreamingSpec. */
  def st6StreamJoinOuter(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    Streaming.runToMemory(s,
      Streaming.streamStreamJoinOuter(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view")),
      "st6_stream_join_outer_tbl", OutputMode.Append())
  }

  val st6Oracle: String =
    """WITH c AS (
      |  SELECT event_id AS click_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS click_ts_us
      |  FROM events WHERE event_type = 'click'),
      |v AS (
      |  SELECT event_id AS view_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS view_ts_us
      |  FROM events WHERE event_type = 'view'),
      |wm AS (
      |  SELECT least((SELECT max(click_ts_us) FROM c),
      |               (SELECT max(view_ts_us) FROM v)) // 1000
      |    - 3600000 AS wm_ms),
      |matched AS (
      |  SELECT c.click_id, c.user_id, c.click_ts_us, v.view_id,
      |    v.view_ts_us
      |  FROM c JOIN v ON c.user_id = v.user_id
      |    AND v.view_ts_us
      |      BETWEEN c.click_ts_us - 3600000000 AND c.click_ts_us),
      |unmatched AS (
      |  SELECT c.click_id, c.user_id, c.click_ts_us,
      |    CAST(NULL AS BIGINT) AS view_id,
      |    CAST(NULL AS BIGINT) AS view_ts_us
      |  FROM c
      |  WHERE NOT EXISTS (SELECT 1 FROM v
      |      WHERE v.user_id = c.user_id AND v.view_ts_us
      |        BETWEEN c.click_ts_us - 3600000000 AND c.click_ts_us)
      |    AND c.click_ts_us // 1000 < (SELECT wm_ms FROM wm))
      |SELECT * FROM matched UNION ALL SELECT * FROM unmatched""".stripMargin

  /** st7 — the native `session_window` sessionizer on the batch frame:
    * must equal st2's gaps-and-islands derivation row-for-row (same
    * oracle), proving the built-in operator and the window-function form
    * agree on real data. The streaming run of the same code (merging
    * session state, watermark eviction) is pinned in StreamingSpec. */
  def st7SessionWindow(s: SparkSession, d: String): DataFrame =
    Streaming.sessionizeNative(Tables.events(s, d))

  /** st8 — stream-STATIC dimension enrichment: the live event stream
    * joined to a batch dimension table (the single most common
    * streaming join in practice — enrich events with account/catalog
    * attributes). Stateless: the static side is planned as an ordinary
    * broadcast per micro-batch, no watermark and no join state at all,
    * which is why it needs none of st4/st6's eviction machinery. The
    * dimension is re-resolved each batch, so a slowly-changing dim picks
    * up updates between batches (documented Spark semantics). */
  def st8StreamStaticJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    val enriched = eventsStream(s, d)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"))
    Streaming.runToMemory(s, enriched, "st8_stream_static_tbl",
      OutputMode.Append())
  }

  val st8Oracle: String =
    """SELECT event_id, user_id, event_type, c_mktsegment, c_nationkey
      |FROM events JOIN customer ON user_id = c_custkey""".stripMargin

  /** One built corpus per (JVM, dataset dir) — the stream runs once;
    * repeat gate/bench invocations re-read the landed corpus table,
    * which is the content-idempotence contract every lake gate row
    * keeps. */
  private val builtDedupCorpus =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** sd1 — DEDUPLICATING STREAMING INGEST end to end through the REAL
    * streaming machinery ([[Streaming.streamDedupToLake]]): two
    * AvailableNow epochs land document batches in a lake corpus table,
    * each batch classified against the lake-resident
    * [[graft.text.DedupIndex]] (bootstrapped by epoch 0 — no separate
    * buildIndex step). The stream plants a cross-epoch exact dup (a
    * copy of doc 0 arriving in epoch 1), a within-batch exact dup (two
    * copies of doc 10 in epoch 1), and a novel reversed text that must
    * be admitted. Near-dup matching is disabled for this row
    * (`simThreshold > 1` is unreachable for the MinHash lane-agreement
    * estimate), so the admitted set is EXACTLY the min-id keeper per
    * distinct text — which the DuckDB oracle re-derives with one
    * window function. Epoch batches split on ascending id ranges, so
    * the first-epoch-wins + smaller-id-within-batch engine rule and
    * the oracle's global min-id rule provably coincide. Replay /
    * crash-recovery semantics are pinned in LakeStreamSpec where a
    * re-executed epoch is observable. */
  def sd1StreamDedupIngest(s: SparkSession, d: String): DataFrame = {
    val corpusTable = builtDedupCorpus.computeIfAbsent(d, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-sd1").toString
      val src = s"$root/src"
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
      val corpus = s"$root/corpus"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      def stage(name: String, df: DataFrame): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft-sd1-stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .find(_.endsWith(".parquet")).get
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          java.nio.file.Paths.get(s"$src/$name")): Unit
      }
      val cfg = graft.text.DedupIndex.Config(simThreshold = 1.5)
      def run(): Unit =
        Streaming.streamDedupToLake(
          s.readStream.schema(docs.schema).parquet(src), corpus,
          s"$root/index", s"$root/ckpt", cfg = cfg).awaitTermination()
      stage("b0.parquet", docs.filter(col("doc_id") < 10))
      run()
      stage("b1.parquet",
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
          .unionByName(docs.filter(col("doc_id") === 0)
            .withColumn("doc_id", lit(100000L)))
          .unionByName(docs.filter(col("doc_id") === 10)
            .withColumn("doc_id", lit(100001L)))
          .unionByName(docs.filter(col("doc_id") === 0)
            .withColumn("doc_id", lit(100002L))
            .withColumn("text", reverse(col("text")))))
      run()
      corpus
    })
    graft.sources.ManifestLake.read(s, corpusTable)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
  }

  val sd1Oracle: String =
    """WITH stream AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 20
      |  UNION ALL
      |  SELECT CAST(100000 AS BIGINT), text FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT CAST(100001 AS BIGINT), text FROM documents WHERE doc_id = 10
      |  UNION ALL
      |  SELECT CAST(100002 AS BIGINT), reverse(text)
      |  FROM documents WHERE doc_id = 0),
      |keyed AS (
      |  SELECT doc_id, text,
      |    min(doc_id) OVER (PARTITION BY text) AS keeper
      |  FROM stream)
      |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
      |FROM keyed WHERE doc_id = keeper""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sd1_stream_dedup_ingest" -> (sd1StreamDedupIngest _),
    "st8_stream_static" -> (st8StreamStaticJoin _),
    "st7_session_window" -> (st7SessionWindow _),
    "st6_stream_join_outer" -> (st6StreamJoinOuter _),
    "st1_windowed_counts" -> (st1WindowedCounts _),
    "st2_sessionize_batch" -> (st2SessionizeBatch _),
    "st3_sessionize_stream" -> (st3SessionizeStream _),
    "st4_stream_join" -> (st4StreamJoin _),
    "st5_stream_dedup" -> (st5StreamDedup _))

  val oracles: Map[String, String] = Map(
    "sd1_stream_dedup_ingest" -> sd1Oracle,
    "st8_stream_static" -> st8Oracle,
    "st7_session_window" -> st2Oracle,
    "st6_stream_join_outer" -> st6Oracle,
    "st1_windowed_counts" -> st1Oracle,
    "st2_sessionize_batch" -> st2Oracle,
    "st3_sessionize_stream" -> st3Oracle,
    "st4_stream_join" -> st4Oracle,
    "st5_stream_dedup" -> st5Oracle)
}
