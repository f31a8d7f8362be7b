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

  private[sources] def sqlEntry(alias: String)
      : Option[(Client, String, String)] =
    Option(sqlTables.get(alias.toLowerCase(java.util.Locale.ROOT)))

  /** The catalog-current staged dir for a registered alias — one
    * pointer GET per query, but the STAGING is reused while the
    * catalog's metadata-location is unchanged (an analyzer that
    * plans the same table many times must not grow the disk by one
    * mirror per query). A dirty mirror (local uncommitted versions)
    * never reuses. */
  private[sources] def sqlDirOf(spark: SparkSession,
                                alias: String): Option[String] =
    sqlEntry(alias).map { case (c, ns, n) =>
      c.loadTableReusing(spark, ns, n).localDir
    }

  /** `INSERT INTO graft_iceberg_rest.<alias>` — positional columns
    * (SQL's INSERT contract), landed through [[Client
    * .appendWithRetry]] so a 409 race re-loads and replays. */
  private[sources] def sqlInsert(spark: SparkSession, alias: String,
                                 source: org.apache.spark.sql
                                   .DataFrame): Unit = {
    val (client, ns, name) = sqlEntry(alias).getOrElse(
      throw new IllegalArgumentException(
        s"graft_iceberg_rest.$alias is not a registered catalog table"))
    val rt = client.loadTable(spark, ns, name)
    val st = IcebergInterop.state(spark, rt.localDir, None)
    require(source.columns.length == st.schema.length,
      s"INSERT arity ${source.columns.length} does not match catalog " +
        s"table $ns.$name (${st.schema.length} columns)")
    client.appendWithRetry(spark, ns, name,
      source.toDF(st.schema.fieldNames.toIndexedSeq: _*))
  }

  /** The registered alias's CURRENT schema field names (lowercased)
    * — the MERGE translation's column-resolution source, served from
    * the reused staging (one pointer GET, no manifest parse needed
    * beyond the head). */
  private[sources] def sqlSchemaNames(spark: SparkSession,
                                      alias: String): Set[String] = {
    val (client, ns, name) = sqlEntry(alias).getOrElse(
      throw new IllegalArgumentException(
        s"graft_iceberg_rest.$alias is not a registered catalog table"))
    IcebergInterop.state(spark,
      client.loadTableReusing(spark, ns, name).localDir, None)
      .schema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
  }

  /** DELETE/UPDATE/MERGE on a registered alias: the kernel DML runs
    * on a fresh staged mirror and publishes through [[Client
    * .mutateWithRetry]] — a 409 re-loads and RE-RUNS the predicate
    * against the winner's state (a predicate is state-independent, so
    * the replay is the correct semantics, unlike a blind diff
    * replay). */
  private[sources] def sqlMutate(spark: SparkSession, alias: String)
                                (body: String => Unit): Unit = {
    val (client, ns, name) = sqlEntry(alias).getOrElse(
      throw new IllegalArgumentException(
        s"graft_iceberg_rest.$alias is not a registered catalog table"))
    client.mutateWithRetry(spark, ns, name)(body)
  }

  /** OAuth2 CLIENT-CREDENTIALS configuration (the REST spec's
    * `/v1/oauth/tokens` flow): the client fetches a bearer token
    * before the first request and refreshes it when `expires_in`
    * lapses; every catalog request carries `Authorization: Bearer`.
    * `tokenEndpoint` overrides the default `{endpoint}/v1/oauth/
    * tokens` for catalogs that delegate to an external issuer. */
  final case class OAuth(clientId: String, clientSecret: String,
                         scope: String = "catalog",
                         tokenEndpoint: Option[String] = None)

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
                     warehouse: Option[String] = None,
                     oauth: Option[OAuth] = None) {

    private def url(pathSegs: String*): String = {
      val pfx = if (prefix.isEmpty) "" else s"/$prefix"
      s"$endpoint/v1$pfx/" + pathSegs.mkString("/")
    }

    // ---- OAuth2 client-credentials token (fetched lazily, refreshed
    // 30 s before expiry; the raw exchange bypasses http() so the
    // token fetch can never recurse into itself)
    @volatile private var bearer: Option[(String, Long)] = None

    private def rawHttp(method: String, u: String, body: Option[String],
                        contentType: String,
                        headers: Map[String, String]): (Int, String) = {
      val conn = new java.net.URL(u).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      conn.setRequestMethod(method)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setRequestProperty("Content-Type", contentType)
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

    private def authHeader(): Map[String, String] = oauth match {
      case None => Map.empty
      case Some(cfg) =>
        val now = System.currentTimeMillis()
        val valid = bearer.filter(_._2 > now + 30000L)
        val tok = valid.getOrElse {
          def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
          val form = s"grant_type=client_credentials&client_id=${
            enc(cfg.clientId)}&client_secret=${
            enc(cfg.clientSecret)}&scope=${enc(cfg.scope)}"
          val (code, text) = rawHttp("POST",
            cfg.tokenEndpoint.getOrElse(s"$endpoint/v1/oauth/tokens"),
            Some(form), "application/x-www-form-urlencoded", props)
          if (code != 200)
            throw new IllegalArgumentException(
              s"REST catalog OAuth token fetch failed: HTTP $code $text")
          val j = JsonMethods.parse(text)
          val access = j \ "access_token" match {
            case JString(t) => t
            case _ => throw new IllegalArgumentException(
              "REST catalog OAuth response carries no access_token")
          }
          val ttlSec = j \ "expires_in" match {
            case JInt(n) => n.toLong
            case JLong(n) => n
            case _ => 3600L
          }
          val fresh = (access, now + ttlSec * 1000L)
          bearer = Some(fresh)
          fresh
        }
        Map("Authorization" -> s"Bearer ${tok._1}")
    }

    private def http(method: String, u: String,
                     body: Option[String]): (Int, String) =
      rawHttp(method, u, body, "application/json",
        props ++ authHeader())

    /** `GET /v1/namespaces` followed through `next-page-token` until
      * the catalog stops paging — multi-level namespaces join with
      * '.'. */
    def listNamespaces(spark: SparkSession): Seq[String] =
      paged(url("namespaces"), "namespaces") {
        case JArray(parts) =>
          Some(parts.collect { case JString(s) => s }.mkString("."))
        case _ => None
      }

    /** `GET /v1/namespaces/{ns}/tables`, paged the same way. */
    def listTables(spark: SparkSession, ns: String): Seq[String] =
      paged(url("namespaces", ns, "tables"), "identifiers") { ident =>
        ident \ "name" match {
          case JString(n) => Some(n)
          case _ => None
        }
      }

    private def paged(base: String, field: String)
                     (extract: JValue => Option[String]): Seq[String] = {
      val out = Seq.newBuilder[String]
      var token: Option[String] = None
      var pages = 0
      var done = false
      while (!done) {
        pages += 1
        if (pages > 10000)
          throw new IllegalStateException(
            s"REST catalog listing at $base exceeded 10000 pages — " +
              "the server is looping its next-page-token")
        val u = token match {
          case Some(t) =>
            s"$base?pageToken=${java.net.URLEncoder.encode(t, "UTF-8")}"
          case None => base
        }
        val (code, text) = http("GET", u, None)
        if (code != 200)
          throw new IllegalArgumentException(
            s"REST catalog listing at $base failed: HTTP $code $text")
        val j = JsonMethods.parse(text)
        (j \ field) match {
          case JArray(xs) => xs.flatMap(extract).foreach(out += _)
          case _ => ()
        }
        (j \ "next-page-token") match {
          case JString(t) if t.nonEmpty && !token.contains(t) =>
            token = Some(t)
          case _ => done = true
        }
      }
      out.result()
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

    /** `GET /v1/{prefix}/namespaces/{ns}/tables/{name}` → the parsed
      * inline metadata, pointer, and concurrency evidence. */
    private def fetchMeta(ns: String, name: String)
        : (JValue, String, String, Long) = {
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
      (meta, metaLoc, uuid, baseSnap)
    }

    private def stage(spark: SparkSession, ns: String, name: String,
                      meta: JValue): String = {
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
      dir
    }

    /** Load and stage a FRESH local mirror. Non-200 refuses by name
      * with the catalog's response attached. Writers need a private
      * mirror (local commits land as v2+); read-only callers that
      * reload often should prefer [[loadTableReusing]]. */
    def loadTable(spark: SparkSession, ns: String,
                  name: String): RestTable = {
      val (meta, metaLoc, uuid, baseSnap) = fetchMeta(ns, name)
      RestTable(stage(spark, ns, name, meta), uuid, baseSnap, metaLoc)
    }

    // staged-mirror cache for READ paths, keyed by table: while the
    // catalog's metadata-location is unchanged the same staged dir
    // serves — a per-query SQL analyzer does one GET but stages no
    // new bytes. A mirror that accumulated LOCAL versions (a caller
    // committed on it) is dirty and never reused.
    private val staged = new java.util.concurrent
      .ConcurrentHashMap[String, (String, String)]()

    /** [[loadTable]], reusing the previous staging while the
      * catalog's pointer is unchanged. Read-only use — local commits
      * on the returned dir poison it for reuse (detected, restaged),
      * so writers should call [[loadTable]]. */
    def loadTableReusing(spark: SparkSession, ns: String,
                         name: String): RestTable = {
      val (meta, metaLoc, uuid, baseSnap) = fetchMeta(ns, name)
      val key = s"$ns.$name"
      val cached = Option(staged.get(key)).collect {
        case (loc, dir) if loc == metaLoc && metaLoc.nonEmpty &&
          cleanStage(spark, dir) => dir
      }
      val dir = cached.getOrElse {
        val d = stage(spark, ns, name, meta)
        staged.put(key, (metaLoc, d)): Unit
        d
      }
      RestTable(dir, uuid, baseSnap, metaLoc)
    }

    /** True when the staged mirror still exists and carries no LOCAL
      * commits (head is the staged v1). */
    private def cleanStage(spark: SparkSession, dir: String): Boolean =
      scala.util.Try {
        val metaDir = new Path(new Path(dir), "metadata")
        val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
        fs.exists(metaDir) && fs.listStatus(metaDir).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("v") &&
            n.endsWith(".metadata.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
          .max == 1L
      }.getOrElse(false)

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
      // base→head changes OUTSIDE this client's update vocabulary
      // refuse BY NAME — committing a partial diff would publish
      // snapshots whose metadata the catalog cannot resolve.
      // (`location` is NOT compared: the local kernel re-stamps the
      // staged mirror's own root there; the catalog keeps its own.)
      // sort orders the local commit added (replaceSortOrder on the
      // staged mirror), then the default pointer — the vocabulary's
      // add-sort-order/set-default-sort-order pair. EDITS to an
      // order the base already lists (or a removal) have no update
      // action and refuse by name.
      def ordersOf(m: JValue): Map[Long, JValue] = (m \ "sort-orders") match {
        case JArray(xs) => xs.map(o => jnum(o \ "order-id") -> o).toMap
        case _ => Map.empty
      }
      val baseOrders = ordersOf(base)
      val headOrders = ordersOf(head)
      baseOrders.keys.foreach { oid =>
        if (!headOrders.contains(oid) ||
          headOrders(oid) != baseOrders(oid))
          throw new IcebergInterop.UnsupportedIcebergFeatureException(
            s"REST catalog commit of $ns.$name would " +
              (if (headOrders.contains(oid)) "EDIT" else "REMOVE") +
              s" sort order $oid — the CommitTableRequest vocabulary " +
              "only ADDS sort orders (add-sort-order); commit this " +
              "change through a native catalog client")
      }
      val headDefaultOrder = jnum(head \ "default-sort-order-id")
      if (headDefaultOrder > 0 && !headOrders.contains(headDefaultOrder))
        throw new IcebergInterop.UnsupportedIcebergFeatureException(
          s"REST catalog commit of $ns.$name points " +
            s"default-sort-order-id at order $headDefaultOrder, which " +
            "the head metadata does not list — refusing the DANGLING " +
            "SORT ORDER pointer rather than publishing it")
      val addedOrders = headOrders.view
        .filterKeys(oid => !baseOrders.contains(oid))
        .toSeq.sortBy(_._1)
      addedOrders.foreach { case (_, o) =>
        updates += JObject(List(
          "action" -> JString("add-sort-order"), "sort-order" -> o))
      }
      if (jnum(head \ "default-sort-order-id") !=
        jnum(base \ "default-sort-order-id")) {
        // -1 = "last added" survives server renumbering, exactly the
        // set-current-schema/set-default-spec convention
        val headDefault = jnum(head \ "default-sort-order-id")
        val lastAdded = addedOrders.lastOption.map(_._1)
        updates += JObject(List(
          "action" -> JString("set-default-sort-order"),
          "sort-order-id" ->
            (if (lastAdded.contains(headDefault)) JInt(-1)
             else head \ "default-sort-order-id")))
      }
      // statistics / partition-statistics entries, keyed by the
      // snapshot they describe: added or replaced → set-*, locally
      // expired → remove-* (the vocabulary's per-snapshot pair)
      Seq(("statistics", "set-statistics", "remove-statistics"),
        ("partition-statistics", "set-partition-statistics",
          "remove-partition-statistics")).foreach {
        case (field, setAction, removeAction) =>
          def entries(m: JValue): Map[Long, JValue] = (m \ field) match {
            case JArray(xs) =>
              xs.map(e => jnum(e \ "snapshot-id") -> e).toMap
            case _ => Map.empty
          }
          val baseE = entries(base)
          val headE = entries(head)
          headE.toSeq.sortBy(_._1).foreach { case (sid, e) =>
            if (!baseE.get(sid).contains(e))
              updates += JObject(List(
                "action" -> JString(setAction),
                "snapshot-id" -> JLong(sid),
                (if (field == "statistics") "statistics"
                 else "partition-statistics") -> e))
          }
          (baseE.keySet -- headE.keySet).toSeq.sorted.foreach { sid =>
            updates += JObject(List(
              "action" -> JString(removeAction),
              "snapshot-id" -> JLong(sid)))
          }
      }
      // schemas added by the local commit, then the current pointer
      val baseSchemaIds = (base \ "schemas") match {
        case JArray(xs) => xs.map(s => jnum(s \ "schema-id")).toSet
        case _ => Set.empty[Long]
      }
      val addedSchemaIds = ((head \ "schemas") match {
        case JArray(xs) => xs.filterNot(s =>
          baseSchemaIds(jnum(s \ "schema-id")))
        case _ => Nil
      }).sortBy(s => jnum(s \ "schema-id"))
      addedSchemaIds.foreach { s =>
        updates += JObject(List(
          "action" -> JString("add-schema"), "schema" -> s))
      }
      if (jnum(head \ "current-schema-id") !=
        jnum(base \ "current-schema-id")) {
        // the REST spec lets the server REASSIGN an added schema's id:
        // when the new current schema is the one this commit just
        // added, point at it as -1 ("last added") so a renumbering
        // server still sets the right one
        val headCur = jnum(head \ "current-schema-id")
        val lastAdded = addedSchemaIds.lastOption
          .map(s => jnum(s \ "schema-id"))
        updates += JObject(List(
          "action" -> JString("set-current-schema"),
          "schema-id" ->
            (if (lastAdded.contains(headCur)) JInt(-1)
             else head \ "current-schema-id")))
      }
      // partition specs the local commit added (an OPTIMIZE/overwrite
      // that evolved the layout), then the default pointer — dropping
      // these would publish manifests whose spec-id the catalog
      // cannot resolve
      val baseSpecIds = (base \ "partition-specs") match {
        case JArray(xs) => xs.map(s => jnum(s \ "spec-id")).toSet
        case _ => Set.empty[Long]
      }
      val addedSpecs = ((head \ "partition-specs") match {
        case JArray(xs) => xs.filterNot(s =>
          baseSpecIds(jnum(s \ "spec-id")))
        case _ => Nil
      }).sortBy(s => jnum(s \ "spec-id"))
      addedSpecs.foreach { s =>
        updates += JObject(List(
          "action" -> JString("add-spec"), "spec" -> s))
      }
      if (jnum(head \ "default-spec-id") != jnum(base \ "default-spec-id")) {
        val headDefault = jnum(head \ "default-spec-id")
        val lastAdded = addedSpecs.lastOption.map(s => jnum(s \ "spec-id"))
        updates += JObject(List(
          "action" -> JString("set-default-spec"),
          "spec-id" ->
            (if (lastAdded.contains(headDefault)) JInt(-1)
             else head \ "default-spec-id")))
      }
      // snapshots the local commit added, then the main-ref move
      val baseIds = snaps(base).map(idOf).toSet
      val headIds = snaps(head).map(idOf).toSet
      snaps(head).filterNot(s => baseIds(idOf(s))).foreach { s =>
        updates += JObject(List(
          "action" -> JString("add-snapshot"), "snapshot" -> s))
      }
      // snapshots a local expireSnapshots dropped: without the
      // remove, the catalog keeps listing snapshots whose manifests
      // the local expiry already deleted from the warehouse —
      // dangling pointers for every catalog reader
      val removedIds = (baseIds -- headIds).toList.sorted
      if (removedIds.nonEmpty)
        updates += JObject(List(
          "action" -> JString("remove-snapshots"),
          "snapshot-ids" -> JArray(removedIds.map(i =>
            JLong(i.toLong): JValue))))
      val headSnap = jnum(head \ "current-snapshot-id")
      if (headSnap != rt.baseSnapshotId && headSnap >= 0)
        updates += JObject(List(
          "action" -> JString("set-snapshot-ref"),
          "ref-name" -> JString("main"),
          "type" -> JString("branch"),
          "snapshot-id" -> (head \ "current-snapshot-id")))
      // named refs beyond main (branches/tags a local createBranch/
      // createTag added or a local drop removed)
      def refsOf(v: JValue): Map[String, JValue] = v \ "refs" match {
        case JObject(kvs) => kvs.toMap
        case _ => Map.empty
      }
      val rBase = refsOf(base)
      val rHead = refsOf(head)
      rHead.toList.sortBy(_._1).foreach { case (rname, node) =>
        if (rname != "main" && !rBase.get(rname).contains(node))
          updates += JObject(List(
            "action" -> JString("set-snapshot-ref"),
            "ref-name" -> JString(rname),
            "type" -> (node \ "type"),
            "snapshot-id" -> (node \ "snapshot-id")))
      }
      (rBase.keySet -- rHead.keySet).toList.sorted
        .filter(_ != "main").foreach { rname =>
          updates += JObject(List(
            "action" -> JString("remove-snapshot-ref"),
            "ref-name" -> JString(rname)))
        }
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

    /** Load → run `body` against the staged mirror → commit, retried
      * on 409 with a FRESH load each round (bounded): the body
      * re-executes against the winner's state, so both racers'
      * effects land with zero client redo — the path-based
      * auto-retry's catalog twin, generalized to any local kernel
      * mutation whose semantics are state-independent (appends,
      * predicate DML). */
    def mutateWithRetry(spark: SparkSession, ns: String, name: String,
                        maxAttempts: Int = 10)
                       (body: String => Unit): Unit = {
      var attempts = 0
      while (true) {
        val rt = loadTable(spark, ns, name)
        body(rt.localDir)
        try { commitTable(spark, ns, name, rt); return }
        catch {
          case e: IcebergInterop.ConcurrentIcebergCommitException =>
            attempts += 1
            if (attempts >= maxAttempts) throw e
        }
      }
    }

    /** Load → local append → commit, retried on 409 with a fresh load
      * each round (bounded) — both racers' rows land. */
    def appendWithRetry(spark: SparkSession, ns: String, name: String,
                        df: org.apache.spark.sql.DataFrame,
                        maxAttempts: Int = 10): Unit =
      mutateWithRetry(spark, ns, name, maxAttempts) { dir =>
        // an append keeps the table's recorded partitioning — a
        // partitioned catalog table appends under its default spec
        val st = IcebergInterop.state(spark, dir, None)
        IcebergInterop.write(df, dir,
          partitionBy = st.specs.getOrElse(st.defaultSpecId, Nil)): Unit
      }
  }
}
