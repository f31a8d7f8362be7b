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

  /** st3 — the stateful streaming sessionizer over the same events (one
    * AvailableNow batch ⇒ sessions closed by in-batch gaps are emitted;
    * open tails stay in state, exactly as a live stream would hold them).
    * Cross-batch state and event-time timeouts are pinned in
    * StreamingSpec with a multi-batch MemoryStream. */
  def st3SessionizeStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val typed = eventsStream(s, d).as[Streaming.Event]
    Streaming.runToMemory(s,
      Streaming.sessionizeStream(typed).toDF(),
      "st3_sessionize_tbl", OutputMode.Append())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_windowed_counts" -> (st1WindowedCounts _),
    "st2_sessionize_batch" -> (st2SessionizeBatch _),
    "st3_sessionize_stream" -> (st3SessionizeStream _))

  val oracles: Map[String, String] = Map(
    "st1_windowed_counts" -> st1Oracle,
    "st2_sessionize_batch" -> st2Oracle)
}
