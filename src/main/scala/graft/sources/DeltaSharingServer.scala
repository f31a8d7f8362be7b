package graft.sources

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import DeltaInterop.UnsupportedDeltaFeatureException

/** DELTA SHARING server (PROTOCOL.md's REST surface, "parquet"
  * response format) over graft Delta tables — the PROVIDER half of
  * the open sharing door: register a table under share/schema/name,
  * hand the consumer a profile (endpoint + bearer token), and any
  * protocol client — [[DeltaSharing.Client]] included, round-tripped
  * in the specs — lists and queries it without object-store
  * credentials.
  *
  * Serving is METADATA-ONLY on the query path: one [[DeltaInterop
  * .state]] replay per request, file actions carry presigned-style
  * urls onto the `/data` endpoint (ranged GETs, no auth — the
  * presigned analog: possession of the url IS the capability, scoped
  * by an unguessable per-server token and a registered-roots check),
  * and the server never opens a parquet file itself. Tables whose
  * CURRENT state needs more than the version-1 parquet response can
  * express — live deletion vectors (rows would resurrect) or column
  * mapping (physical names diverge from the schema) — refuse BY
  * NAME rather than serve wrong rows. The `/changes` endpoint
  * publishes [[DeltaInterop.shareChangeActions]]'s add / cdf /
  * remove walk, so server and local change feed agree on every
  * refusal (CDF not enabled, vacuumed pre-images).
  *
  * Reference scope: the wire contract is complete for local/posix
  * warehouses (the test posture); a production deployment would swap
  * the `/data` endpoint for real object-store presigning —
  * everything else is storage-agnostic. */
final class DeltaSharingServer(spark: SparkSession, bearerToken: String) {

  // share -> schema -> table -> delta path (insertion-ordered)
  private val tables = new java.util.concurrent
    .ConcurrentHashMap[(String, String, String), String]()
  private val order = new java.util.concurrent
    .CopyOnWriteArrayList[(String, String, String)]()

  // the presigned-url stand-in: possession of this token (embedded in
  // every served url) is the data capability
  private val dataToken =
    java.util.UUID.randomUUID().toString.replace("-", "")

  private var server: Option[HttpServer] = None
  private var port: Int = 0

  def addTable(share: String, schema: String, name: String,
               deltaPath: String): Unit = {
    val key = (share, schema, name)
    if (tables.putIfAbsent(key, deltaPath) == null) order.add(key): Unit
  }

  /** Bind an ephemeral port; the profile-ready endpoint. All server
    * threads are DAEMONS (the dispatcher inherits daemon status from
    * the starter thread) — a process hosting a share must still be
    * able to exit without an explicit stop(). */
  def start(): String = {
    val s = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/delta-sharing", (ex: HttpExchange) =>
      safely(ex)(handleApi))
    s.createContext("/data", (ex: HttpExchange) => safely(ex)(handleData))
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-sharing-worker")
        t.setDaemon(true)
        t
      }))
    val starter = new Thread(() => s.start(), "graft-sharing-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server = Some(s)
    port = s.getAddress.getPort
    endpoint
  }

  def endpoint: String = s"http://127.0.0.1:$port/delta-sharing"

  /** A ready-to-parse recipient profile document. */
  def profileJson: String =
    s"""{"shareCredentialsVersion":1,"endpoint":${jq(endpoint)},""" +
      s""""bearerToken":${jq(bearerToken)}}"""

  def stop(): Unit = {
    server.foreach(_.stop(0))
    server = None
  }

  // ---- plumbing -----------------------------------------------------

  private def safely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try f(ex)
    catch {
      case e: IllegalArgumentException => respond(ex, 400, e.getMessage)
      case e: UnsupportedDeltaFeatureException =>
        respond(ex, 400, e.getMessage)
      case e: Exception => respond(ex, 500, String.valueOf(e))
    } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    headers.foreach { case (k, v) =>
      ex.getResponseHeaders.set(k, v)
    }
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val out = ex.getResponseBody
      try out.write(bytes) finally out.close()
    }
  }

  private def jq(s: String): String = JsonMethods.compact(JString(s))

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $bearerToken")

  private def page(ex: HttpExchange, all: Seq[String],
                   render: String => String): Unit = {
    val q = query(ex)
    val from = q.get("pageToken").map(_.toInt).getOrElse(0)
    val max = q.get("maxResults").map(_.toInt).getOrElse(500)
    require(from >= 0 && from <= all.length,
      s"bad pageToken ${q.get("pageToken").getOrElse("")}")
    val slice = all.slice(from, from + max)
    val next =
      if (from + max < all.length)
        s""","nextPageToken":${jq(String.valueOf(from + max))}"""
      else ""
    respond(ex, 200,
      s"""{"items":[${slice.map(render).mkString(",")}]$next}""",
      Map("Content-Type" -> "application/json"))
  }

  // ---- API routing --------------------------------------------------

  private def handleApi(ex: HttpExchange): Unit = {
    if (!authed(ex)) { respond(ex, 401, "invalid bearer token"); return }
    import scala.jdk.CollectionConverters._
    val segs = ex.getRequestURI.getPath
      .stripPrefix("/delta-sharing").stripPrefix("/")
      .split('/').filter(_.nonEmpty)
      .map(s => java.net.URLDecoder.decode(s, "UTF-8")).toSeq
    val keys = order.asScala.toSeq
    segs match {
      case Seq("shares") =>
        page(ex, keys.map(_._1).distinct,
          n => s"""{"name":${jq(n)}}""")
      case Seq("shares", sh, "schemas") =>
        requireKnown(keys.exists(_._1 == sh), s"share $sh")
        page(ex, keys.filter(_._1 == sh).map(_._2).distinct,
          n => s"""{"name":${jq(n)},"share":${jq(sh)}}""")
      case Seq("shares", sh, "schemas", sc, "tables") =>
        requireKnown(keys.exists(k => k._1 == sh && k._2 == sc),
          s"schema $sh.$sc")
        page(ex, keys.filter(k => k._1 == sh && k._2 == sc).map(_._3),
          n => s"""{"name":${jq(n)},"schema":${jq(sc)},""" +
            s""""share":${jq(sh)}}""")
      case Seq("shares", sh, "schemas", sc, "tables", t, verb) =>
        val path = Option(tables.get((sh, sc, t))).getOrElse(
          throw new IllegalArgumentException(
            s"table $sh.$sc.$t is not shared"))
        verb match {
          case "version" =>
            val st = DeltaInterop.state(spark, path, None)
            respond(ex, 200, "",
              Map("Delta-Table-Version" -> st.version.toString))
          case "metadata" =>
            val st = DeltaInterop.state(spark, path, None)
            respond(ex, 200, protoLine + "\n" + metaLine(st),
              Map("Content-Type" -> "application/x-ndjson",
                "Delta-Table-Version" -> st.version.toString))
          case "query" =>
            require(ex.getRequestMethod == "POST",
              "query is a POST endpoint")
            val body = scala.io.Source
              .fromInputStream(ex.getRequestBody, "UTF-8").mkString
            val j = if (body.trim.isEmpty) JObject() else
              JsonMethods.parse(body)
            val version = j \ "version" match {
              case JInt(v) => Some(v.toLong)
              case JLong(v) => Some(v)
              case _ => None
            }
            // predicateHints / limitHint are best-effort by spec;
            // this server serves the full file list and lets the
            // client's own plan filter
            val st = DeltaInterop.state(spark, path, version)
            requireServable(st, s"$sh.$sc.$t")
            val root = new Path(path)
            val fileLines = st.files.map { a =>
              val abs = new Path(root, a.path)
              s"""{"file":{"url":${jq(dataUrl(abs))},"id":${
                jq(a.path)},"partitionValues":${pvJson(
                a.partitionValues)},"size":${a.size}}}"""
            }
            respond(ex, 200,
              (Seq(protoLine, metaLine(st)) ++ fileLines).mkString("\n"),
              Map("Content-Type" -> "application/x-ndjson",
                "Delta-Table-Version" -> st.version.toString))
          case "changes" =>
            val q = query(ex)
            if (q.contains("startingTimestamp"))
              throw new UnsupportedDeltaFeatureException(
                "changes by startingTimestamp is not served — address " +
                  "versions (startingVersion/endingVersion)")
            val from = q.get("startingVersion").map(_.toLong).getOrElse(
              throw new IllegalArgumentException(
                "changes requires startingVersion"))
            val st = DeltaInterop.state(spark, path, None)
            requireServable(st, s"$sh.$sc.$t")
            val to = q.get("endingVersion").map(_.toLong)
              .getOrElse(st.version)
            val root = new Path(path)
            val fs = root.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            val lines = DeltaInterop
              .shareChangeActions(spark, path, from, to).map { a =>
                val abs = new Path(root, a.path)
                val size = fs.getFileStatus(abs).getLen
                s"""{"${a.kind}":{"url":${jq(dataUrl(abs))},"id":${
                  jq(a.path)},"partitionValues":${pvJson(
                  a.partitionValues)},"size":$size,"version":${
                  a.version},"timestamp":${a.timestamp}}}"""
              }
            respond(ex, 200,
              (Seq(protoLine, metaLine(st)) ++ lines).mkString("\n"),
              Map("Content-Type" -> "application/x-ndjson",
                "Delta-Table-Version" -> st.version.toString))
          case other =>
            throw new IllegalArgumentException(s"unknown verb $other")
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown route /${other.mkString("/")}")
    }
  }

  private def requireKnown(ok: Boolean, what: String): Unit =
    if (!ok) throw new IllegalArgumentException(s"$what is not shared")

  /** The version-1 parquet response cannot express live deletion
    * vectors (rows would resurrect) or column mapping (the files
    * carry physical names the schemaString does not) — refuse by
    * name, the courtesy every graft reader extends. */
  private def requireServable(st: DeltaInterop.DeltaState,
                              table: String): Unit = {
    if (st.files.exists(_.dv.nonEmpty))
      throw new UnsupportedDeltaFeatureException(
        s"shared table $table carries live DELETION VECTORS — the " +
          "parquet response format would resurrect deleted rows; " +
          "REORG (purge) the table or serve the delta format")
    if (st.columnMappingMode != "none")
      throw new UnsupportedDeltaFeatureException(
        s"shared table $table uses column mapping " +
          s"'${st.columnMappingMode}' — its files carry physical " +
          "names the parquet response format cannot rename")
  }

  private def protoLine: String =
    """{"protocol":{"minReaderVersion":1}}"""

  private def metaLine(st: DeltaInterop.DeltaState): String = {
    val parts = st.partitionColumns.map(jq).mkString("[", ",", "]")
    val cfg = st.configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .mkString("{", ",", "}")
    s"""{"metaData":{"id":${jq(st.metaId.getOrElse("graft"))},""" +
      s""""format":{"provider":"parquet"},"schemaString":${
        jq(st.schema.json)},"partitionColumns":$parts,""" +
      s""""configuration":$cfg,"version":${st.version}}}"""
  }

  private def pvJson(pv: Map[String, Option[String]]): String =
    pv.toSeq.sortBy(_._1).map {
      case (k, Some(v)) => s"${jq(k)}:${jq(v)}"
      case (k, None) => s"${jq(k)}:null"
    }.mkString("{", ",", "}")

  private def dataUrl(abs: Path): String = {
    val b64 = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(abs.toUri.getPath
        .getBytes(StandardCharsets.UTF_8))
    s"http://127.0.0.1:$port/data/$b64?t=$dataToken"
  }

  // ---- the presigned-url stand-in ----------------------------------

  private def handleData(ex: HttpExchange): Unit = {
    val q = query(ex)
    if (!q.get("t").contains(dataToken)) {
      respond(ex, 403, "bad or missing url token"); return
    }
    val b64 = ex.getRequestURI.getPath.stripPrefix("/data/")
    val local = new String(java.util.Base64.getUrlDecoder.decode(b64),
      StandardCharsets.UTF_8)
    // capability check: only files under a registered table root serve
    import scala.jdk.CollectionConverters._
    val canon = new java.io.File(local).getCanonicalPath
    val under = tables.values.asScala.exists { root =>
      val r = new java.io.File(
        new Path(root).toUri.getPath).getCanonicalPath
      canon.startsWith(r + java.io.File.separator)
    }
    if (!under) { respond(ex, 403, s"$local is not a shared file"); return }
    val file = new java.io.File(canon)
    if (!file.isFile) { respond(ex, 404, s"$local not found"); return }
    val len = file.length()
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
    val (from, to) = range match {
      case Some(r) =>
        val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r).getOrElse(
          throw new IllegalArgumentException(s"bad Range '$r'"))
        val a = m.group(1).toLong
        val b = if (m.group(2).isEmpty) len - 1 else m.group(2).toLong
        (a, math.min(b, len - 1))
      case None => (0L, len - 1)
    }
    val n = (to - from + 1).toInt
    val buf = new Array[Byte](n)
    val raf = new java.io.RandomAccessFile(file, "r")
    try { raf.seek(from); raf.readFully(buf) } finally raf.close()
    if (range.isDefined)
      ex.getResponseHeaders.set("Content-Range",
        s"bytes $from-$to/$len")
    ex.sendResponseHeaders(if (range.isDefined) 206 else 200, n.toLong)
    val out = ex.getResponseBody
    try out.write(buf) finally out.close()
  }
}
