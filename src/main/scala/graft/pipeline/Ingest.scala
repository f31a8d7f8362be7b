package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.{Clock, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** Ingest layer — S1-S4: HTTP feed fetchers + byte-verbatim raw sink
  * (`/root/reference/dags/lib/velib_data_fetcher.py:18-127`,
  * `/root/reference/dags/lib/lime_data_fetcher.py:14-68`).
  *
  * Pure JVM, no Spark: ingestion runs driver-side before any Spark job,
  * exactly like the reference's PythonOperator. The HTTP client is a
  * trait so tests (and this offline environment) use fixture bytes — the
  * network never participates in correctness.
  */

/** One GBFS feed: public endpoint, raw-zone prefix, drop file name. URLs
  * and prefixes are the reference's defaults. */
final case class Feed(name: String, url: String, rawPrefix: String,
                      fileName: String)

object Feed {
  val VelibSs = Feed("velib_ss",
    "https://velib-metropole-opendata.smovengo.cloud/opendata/Velib_Metropole/station_status.json",
    "raw/velib/stations_status/", "station_status.json")
  val VelibSi = Feed("velib_si",
    "https://velib-metropole-opendata.smovengo.cloud/opendata/Velib_Metropole/station_information.json",
    "raw/velib/station_information/", "station_information.json")
  val LimeFbs = Feed("lime_fbs",
    "https://data.lime.bike/api/partners/v2/gbfs/paris/free_bike_status",
    "raw/lime/free_bike_status/", "station_status.json")
}

trait FeedClient {
  /** Fetch the current feed payload; throws on failure (the retry policy
    * owns recovery — unlike the reference, which swallows fetch errors and
    * silently returns no key, `velib_data_fetcher.py:66-71`). */
  def fetch(feed: Feed): Array[Byte]
}

/** S1-S3 — live HTTP client: 10 s timeout, non-2xx raises. */
final class HttpFeedClient(timeoutSeconds: Long = 10) extends FeedClient {
  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  def fetch(feed: Feed): Array[Byte] = {
    val req = HttpRequest.newBuilder(URI.create(feed.url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"feed ${feed.name}: HTTP ${resp.statusCode()} from ${feed.url}")
    resp.body()
  }
}

/** Offline client serving fixture files by feed name. */
final class FixtureFeedClient(fixtureDir: String) extends FeedClient {
  private val files = Map(
    "velib_ss" -> "station_status.json",
    "velib_si" -> "station_information.json",
    "lime_fbs" -> "free_bike_status.json")
  def fetch(feed: Feed): Array[Byte] =
    Files.readAllBytes(Paths.get(s"$fixtureDir/${files(feed.name)}"))
}

object Ingest {
  private val dayFmt = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val timeFmt = DateTimeFormatter.ofPattern("HHmmss")

  /** S4 — fetch and store bytes verbatim under
    * `<lakeRoot>/<rawPrefix><YYYYMMDD>/<HHMMSS>/<fileName>` (the
    * reference's key layout, `velib_data_fetcher.py:27-29`). Returns the
    * drop path — the "XCom" value the transform step consumes. */
  def fetchStore(client: FeedClient, feed: Feed, lakeRoot: String,
                 clock: Clock = Clock.systemUTC()): String = {
    val now = ZonedDateTime.now(clock.withZone(ZoneOffset.UTC))
    val key = s"${feed.rawPrefix}${now.format(dayFmt)}/${now.format(timeFmt)}/${feed.fileName}"
    val bytes = client.fetch(feed)
    val target = Paths.get(s"$lakeRoot/$key")
    Files.createDirectories(target.getParent)
    Files.write(target, bytes)
    s"$lakeRoot/$key"
  }

  /** Recover the drop instant [[fetchStore]] embedded in a raw key —
    * the `<YYYYMMDD>/<HHMMSS>` segments immediately above the file
    * name, read back with the SAME formatters and UTC zone that wrote
    * them, so the two can never disagree. This is what lets the
    * reference's dated-key layout compose with the lake's hour-
    * granularity time partitioning: the drop path IS the event time of
    * the snapshot it holds. */
  def dropInstant(dropPath: String): java.time.Instant = {
    val segs = dropPath.split('/')
    require(segs.length >= 3,
      s"not a dated drop path (needs .../YYYYMMDD/HHMMSS/<file>): $dropPath")
    val (day, time) = (segs(segs.length - 3), segs(segs.length - 2))
    java.time.LocalDateTime
      .parse(s"$day$time", DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      .toInstant(ZoneOffset.UTC)
  }
}
