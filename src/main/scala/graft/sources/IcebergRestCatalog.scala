package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg REST CATALOG client (the REST Catalog OpenAPI's
  * `LoadTableResult` / `CommitTableRequest` surface) — how most
  * managed Iceberg is addressed in practice, where the Hadoop-layout
  * `version-hint.text` does not exist and the CATALOG owns the
  * current-metadata pointer.
  *
  * Design: the catalog is only the METADATA POINTER authority; data,
  * manifests and metadata documents live in the warehouse under
  * absolute paths. So the client STAGES the loaded table metadata as
  * a local Hadoop-layout table (`metadata/v1.metadata.json` +
  * `version-hint.text`) and every existing graft kernel — [[
  * IcebergInterop.read]], DML, OPTIMIZE, schema evolution — runs on
  * it UNCHANGED (absolute file paths resolve as-is). A kernel commit
  * lands locally as `v2.metadata.json`; [[Client.commitTable]] then
  * DIFFS base→head into the OpenAPI's update actions (`add-snapshot`,
  * `set-snapshot-ref`, `add-schema`, `set-current-schema`,
  * `set-properties`, `upgrade-format-version`) guarded by the
  * requirements (`assert-table-uuid`, `assert-ref-snapshot-id` on
  * `main`), and POSTs one `CommitTableRequest`. The catalog's 409 =
  * lost the optimistic race, surfaced as
  * [[IcebergInterop.ConcurrentIcebergCommitException]] —
  * [[Client.appendWithRetry]] re-loads and replays, the same bounded
  * rebase discipline the path-based appends got in r15.
  *
  * Scale shape: one GET per load, one POST per commit — O(1) driver
  * HTTP either way; the metadata document rides the response body
  * (the OpenAPI ships `metadata` inline), so no warehouse round-trip
  * is needed to begin reading. */
object IcebergRestCatalog {

  /** The SQL namespace: `SELECT … FROM graft_iceberg_rest.<alias>`
    * loads THROUGH the catalog — a fresh metadata fetch per query, so
    * reads are catalog-current; planning then rides the ordinary
    * path-based read kernel unchanged. Writes go through the
    * [[Client]] API (a commit needs the catalog round-trip). */
  val Namespace = "graft_iceberg_rest"

  private val sqlTables = new java.util.concurrent
    .ConcurrentHashMap[String, (Client, String, String)]()

  /** Register `alias` so SQL can address catalog table `ns`.`name`
    * through `client` as `graft_iceberg_rest.alias`. */
  def register(alias: String, client: Client, ns: String,
               name: String): Unit =
    sqlTables.put(alias.toLowerCase(java.util.Locale.ROOT),
      (client, ns, name)): Unit

  def unregister(alias: String): Unit =
    sqlTables.remove(alias.toLowerCase(java.util.Locale.ROOT)): Unit

  /** The catalog-current staged dir for a registered alias — one
    * loadTable (one GET) per query. */
  private[sources] def sqlDirOf(spark: SparkSession,
                                alias: String): Option[String] =
    Option(sqlTables.get(alias.toLowerCase(java.util.Locale.ROOT)))
      .map { case (c, ns, n) => c.loadTable(spark, ns, n).localDir }

  /** A loaded table: `localDir` is the staged Hadoop-layout mirror
    * every kernel operates on; `baseSnapshotId`/`uuid` are the
    * optimistic-concurrency evidence the commit asserts. */
  final case class RestTable(localDir: String, uuid: String,
                             baseSnapshotId: Long,
                             metadataLocation: String)

  /** `warehouse` pins where loads stage their mirror (and thus where
    * data files a local kernel writes land) — one stable root per
    * catalog, the production posture; None = a fresh temp dir per
    * load (fine for tests: committed data files persist either way,
    * addressed by absolute path). `props` ride every request as
    * headers (e.g. an Authorization bearer). */
  final class Client(endpoint: String, prefix: String = "",
                     props: Map[String, String] = Map.empty,
                     warehouse: Option[String] = None) {

    private def url(pathSegs: String*): String = {
      val pfx = if (prefix.isEmpty) "" else s"/$prefix"
      s"$endpoint/v1$pfx/" + pathSegs.mkString("/")
    }

    private def http(method: String, u: String,
                     body: Option[String]): (Int, String) = {
      val conn = new java.net.URL(u).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      conn.setRequestMethod(method)
      props.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(b.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      val code = conn.getResponseCode
      val stream =
        if (code >= 400) Option(conn.getErrorStream)
        else Option(conn.getInputStream)
      val text = stream.map { in =>
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }.getOrElse("")
      (code, text)
    }

    private def compactJ(v: JValue): String =
      JsonMethods.compact(JsonMethods.render(v))

    /** `POST /v1/{prefix}/namespaces/{ns}/tables` — the OpenAPI's
      * CreateTableRequest: registers an EMPTY table with the given
      * schema (and an identity partition spec over `partitionBy`)
      * at the catalog. Data then lands through the ordinary
      * load → local append → [[commitTable]] flow (or
      * [[appendWithRetry]]). 409 = the name exists. */
    def createTable(spark: SparkSession, ns: String, name: String,
                    schema: org.apache.spark.sql.types.StructType,
                    partitionBy: Seq[String] = Nil,
                    properties: Map[String, String] = Map.empty): Unit = {
      val schemaJson = IcebergInterop.icebergSchemaJson(schema)
      partitionBy.foreach(c => require(schema.fieldNames.contains(c),
        s"partition column $c is not in the schema of $ns.$name"))
      val fieldIds = schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> (i + 1) }.toMap
      val specFields = partitionBy.zipWithIndex.map { case (c, i) =>
        s"""{"name":${jq(c)},"transform":"identity",""" +
          s""""source-id":${fieldIds(c)},"field-id":${1000 + i}}"""
      }.mkString("[", ",", "]")
      val propsJson = JsonMethods.compact(JsonMethods.render(
        JObject(properties.toList.map { case (k, v) =>
          k -> (JString(v): JValue) })))
      val body =
        s"""{"name":${jq(name)},"schema":$schemaJson,""" +
          s""""partition-spec":{"spec-id":0,"fields":$specFields},""" +
          s""""properties":$propsJson}"""
      val (code, text) = http("POST", url("namespaces", ns, "tables"),
        Some(body))
      if (code == 409)
        throw new IllegalArgumentException(
          s"REST catalog create of $ns.$name: the name already " +
            s"exists (HTTP 409): $text")
      if (code != 200)
        throw new IllegalArgumentException(
          s"REST catalog create of $ns.$name failed: HTTP $code $text")
    }

    private def jq(s: String): String =
      JsonMethods.compact(JsonMethods.render(JString(s)))

    /** `GET /v1/{prefix}/namespaces/{ns}/tables/{name}` → the staged
      * local mirror. Non-200 refuses by name with the catalog's
      * response attached. */
    def loadTable(spark: SparkSession, ns: String,
                  name: String): RestTable = {
      val (code, text) = http("GET",
        url("namespaces", ns, "tables", name), None)
      if (code != 200)
        throw new IllegalArgumentException(
          s"REST catalog load of $ns.$name failed: HTTP $code $text")
      val parsed = JsonMethods.parse(text)
      val meta = parsed \ "metadata" match {
        case JNothing => throw new IllegalArgumentException(
          s"REST catalog load of $ns.$name returned no inline " +
            "metadata — this client needs the OpenAPI's `metadata` " +
            "field")
        case m => m
      }
      val metaLoc = parsed \ "metadata-location" match {
        case JString(s) => s
        case _ => ""
      }
      val uuid = meta \ "table-uuid" match {
        case JString(u) => u
        case _ => ""
      }
      val baseSnap = meta \ "current-snapshot-id" match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => -1L
      }
      val dir = warehouse match {
        case Some(w) =>
          s"$w/$ns/$name-${java.util.UUID.randomUUID()}"
        case None => java.nio.file.Files
          .createTempDirectory("graft-rest-stage").toString + "/t"
      }
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val metaDir = new Path(root, "metadata")
      fs.mkdirs(metaDir)
      def writeText(p: Path, s: String): Unit = {
        val out = fs.create(p, true)
        try out.write(s.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      writeText(new Path(metaDir, "v1.metadata.json"), compactJ(meta))
      writeText(new Path(metaDir, "version-hint.text"), "1")
      RestTable(dir, uuid, baseSnap, metaLoc)
    }

    /** Diff the staged mirror's base (v1) against its head (the
      * newest local `v*.metadata.json` a kernel committed) into ONE
      * `CommitTableRequest` and POST it. 409 → the named concurrent-
      * commit refusal (re-load and replay to retry); other non-200s
      * refuse with the response attached. */
    def commitTable(spark: SparkSession, ns: String, name: String,
                    rt: RestTable): Unit = {
      val root = new Path(rt.localDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val metaDir = new Path(root, "metadata")
      def slurp(p: Path): String = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      val headVersion = fs.listStatus(metaDir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") &&
          n.endsWith(".metadata.json") =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
        .max
      if (headVersion == 1L) return // nothing committed locally
      val base = JsonMethods.parse(slurp(
        new Path(metaDir, "v1.metadata.json")))
      val head = JsonMethods.parse(slurp(
        new Path(metaDir, s"v$headVersion.metadata.json")))
      def snaps(v: JValue): Seq[JValue] = v \ "snapshots" match {
        case JArray(xs) => xs
        case _ => Nil
      }
      def idOf(s: JValue): BigInt = s \ "snapshot-id" match {
        case JInt(n) => n
        case JLong(n) => BigInt(n)
        case _ => BigInt(-1)
      }
      def jnum(v: JValue): Long = v match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => -1L
      }
      val updates = scala.collection.mutable.ArrayBuffer.empty[JValue]
      // v3 ROW LINEAGE boundary: a data-adding v3 commit advances
      // `next-row-id`, and the CommitTableRequest update vocabulary
      // this client speaks has NO action to advance it at the
      // catalog — publishing the snapshot without it would hand the
      // NEXT writer a stale allocation cursor and duplicate row ids.
      // Refuse by name rather than corrupt lineage.
      if (jnum(head \ "next-row-id") > jnum(base \ "next-row-id") &&
        jnum(base \ "next-row-id") >= 0)
        throw new IcebergInterop.UnsupportedIcebergFeatureException(
          s"REST catalog commit of $ns.$name would advance the v3 " +
            s"row-id cursor (next-row-id ${jnum(base \ "next-row-id")}" +
            s" → ${jnum(head \ "next-row-id")}) but the REST " +
            "CommitTableRequest vocabulary has no update action for " +
            "it — committing anyway would hand the next writer " +
            "colliding row ids; use the path-based catalog for v3 " +
            "row-lineage tables")
      // format upgrade first — later updates may depend on it
      if (jnum(head \ "format-version") > jnum(base \ "format-version"))
        updates += JObject(List(
          "action" -> JString("upgrade-format-version"),
          "format-version" -> (head \ "format-version")))
      // schemas added by the local commit, then the current pointer
      val baseSchemaIds = (base \ "schemas") match {
        case JArray(xs) => xs.map(s => jnum(s \ "schema-id")).toSet
        case _ => Set.empty[Long]
      }
      (head \ "schemas") match {
        case JArray(xs) => xs.filterNot(s =>
          baseSchemaIds(jnum(s \ "schema-id"))).foreach { s =>
          updates += JObject(List(
            "action" -> JString("add-schema"), "schema" -> s))
        }
        case _ => ()
      }
      if (jnum(head \ "current-schema-id") !=
        jnum(base \ "current-schema-id"))
        updates += JObject(List(
          "action" -> JString("set-current-schema"),
          "schema-id" -> (head \ "current-schema-id")))
      // snapshots the local commit added, then the main-ref move
      val baseIds = snaps(base).map(idOf).toSet
      snaps(head).filterNot(s => baseIds(idOf(s))).foreach { s =>
        updates += JObject(List(
          "action" -> JString("add-snapshot"), "snapshot" -> s))
      }
      val headSnap = jnum(head \ "current-snapshot-id")
      if (headSnap != rt.baseSnapshotId && headSnap >= 0)
        updates += JObject(List(
          "action" -> JString("set-snapshot-ref"),
          "ref-name" -> JString("main"),
          "type" -> JString("branch"),
          "snapshot-id" -> (head \ "current-snapshot-id")))
      // property deltas (the streaming replay ledger rides here)
      def propsOf(v: JValue): Map[String, JValue] =
        v \ "properties" match {
          case JObject(kvs) => kvs.toMap
          case _ => Map.empty
        }
      val pBase = propsOf(base)
      val pHead = propsOf(head)
      val changed = pHead.filter { case (k, v) =>
        !pBase.get(k).contains(v) }
      if (changed.nonEmpty)
        updates += JObject(List(
          "action" -> JString("set-properties"),
          "updates" -> JObject(changed.toList)))
      val removedProps = (pBase.keySet -- pHead.keySet).toList.sorted
      if (removedProps.nonEmpty)
        updates += JObject(List(
          "action" -> JString("remove-properties"),
          "removals" -> JArray(removedProps.map(JString(_)))))
      if (updates.isEmpty) return
      // the optimistic-concurrency guard: main must still point where
      // we loaded it — a null snapshot-id asserts "no snapshot yet"
      // (two racing FIRST appends must not both land)
      val requirements: List[JValue] = List(
        JObject(List("type" -> JString("assert-table-uuid"),
          "uuid" -> JString(rt.uuid))),
        JObject(List(
          "type" -> JString("assert-ref-snapshot-id"),
          "ref" -> JString("main"),
          "snapshot-id" ->
            (if (rt.baseSnapshotId >= 0) JLong(rt.baseSnapshotId)
             else JNull))))
      val req = compactJ(JObject(List(
        "identifier" -> JObject(List(
          "namespace" -> JArray(List(JString(ns))),
          "name" -> JString(name))),
        "requirements" -> JArray(requirements),
        "updates" -> JArray(updates.toList))))
      val (code, text) = http("POST",
        url("namespaces", ns, "tables", name), Some(req))
      if (code == 409)
        throw new IcebergInterop.ConcurrentIcebergCommitException(
          s"REST catalog commit of $ns.$name lost the optimistic " +
            s"race (HTTP 409): $text — re-load the table and retry")
      if (code != 200)
        throw new IllegalArgumentException(
          s"REST catalog commit of $ns.$name failed: HTTP $code $text")
    }

    /** Load → local append → commit, retried on 409 with a fresh load
      * each round (bounded) — both racers' rows land with zero client
      * redo, the path-based auto-retry's catalog twin. */
    def appendWithRetry(spark: SparkSession, ns: String, name: String,
                        df: org.apache.spark.sql.DataFrame,
                        maxAttempts: Int = 10): Unit = {
      var attempts = 0
      while (true) {
        val rt = loadTable(spark, ns, name)
        IcebergInterop.write(df, rt.localDir)
        try { commitTable(spark, ns, name, rt); return }
        catch {
          case e: IcebergInterop.ConcurrentIcebergCommitException =>
            attempts += 1
            if (attempts >= maxAttempts) throw e
        }
      }
    }
  }
}
