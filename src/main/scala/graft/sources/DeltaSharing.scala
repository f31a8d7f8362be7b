package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType, DataType, LongType, TimestampType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import DeltaInterop.UnsupportedDeltaFeatureException

/** DELTA SHARING client (the delta-io/delta-sharing PROTOCOL.md REST
  * surface, "parquet" response format) — the open cross-vendor door
  * for CONSUMING someone else's lake without credentials to their
  * object store: a provider hands out a profile file (endpoint +
  * bearer token), the recipient lists shares/schemas/tables, and a
  * table query returns newline-delimited JSON — a `protocol` line, a
  * `metaData` line (the table's Spark-JSON `schemaString` +
  * partition columns), then one `file` line per data file with a
  * PRESIGNED url.
  *
  * Design: the presigned urls become paths of [[GraftShareFs]] — a
  * read-only Hadoop FileSystem whose paths EMBED the url and size
  * (`graftshare://h/<size>/<base64url>`), serving ranged HTTP GETs.
  * That keeps the actual data read on Spark's ordinary vectorized
  * parquet scan — distributed across executors, predicate pushdown
  * and column pruning intact, nothing routed through the driver —
  * and needs no shared url registry (each task decodes the url from
  * the path it was handed, so the scheme survives a real cluster).
  * The driver's HTTP is O(1) per query: one POST returning the file
  * list.
  *
  * Partition columns do not live in the data files (Delta's layout);
  * the client re-attaches them per distinct partition tuple — the
  * same per-group read [[DeltaInterop.filesToDF]] performs locally.
  *
  * Change-data-feed queries (`/changes`) reassemble the protocol's
  * add / cdf / remove actions into the `_change_type` /
  * `_commit_version` / `_commit_timestamp` frame [[DeltaInterop
  * .changeFeed]] serves locally: a version's cdf files supersede
  * file-level derivation (the spec's rule), adds read as inserts,
  * removes read as deletes from the still-addressable pre-image
  * file. */
object DeltaSharing {

  /** The recipient profile (`*.share` file): format version 1 only —
    * a future `shareCredentialsVersion` changes the auth contract,
    * so anything else refuses by name. `expirationTime`, when
    * present, is checked at REQUEST time (an expired token should
    * fail with the real reason, not a server 401). */
  final case class Profile(endpoint: String, bearerToken: String,
                           expirationTime: Option[String] = None)

  object Profile {
    def fromJson(text: String): Profile = {
      val j = JsonMethods.parse(text)
      j \ "shareCredentialsVersion" match {
        case JInt(v) if v == 1 => ()
        case JInt(v) => throw new IllegalArgumentException(
          s"delta-sharing profile: shareCredentialsVersion $v is not " +
            "supported (this client speaks version 1)")
        case _ => throw new IllegalArgumentException(
          "delta-sharing profile: no shareCredentialsVersion")
      }
      val endpoint = j \ "endpoint" match {
        case JString(e) => e.stripSuffix("/")
        case _ => throw new IllegalArgumentException(
          "delta-sharing profile: no endpoint")
      }
      val token = j \ "bearerToken" match {
        case JString(t) => t
        case _ => throw new IllegalArgumentException(
          "delta-sharing profile: no bearerToken")
      }
      val exp = j \ "expirationTime" match {
        case JString(t) => Some(t)
        case _ => None
      }
      Profile(endpoint, token, exp)
    }
  }

  /** One shared table's metadata (the `metaData` response line). */
  final case class ShareMeta(id: String, schema: StructType,
                             partitionColumns: Seq[String],
                             configuration: Map[String, String],
                             version: Option[Long])

  /** One `file` action: a presigned url + the partition tuple the
    * file lives under. */
  final case class ShareFile(url: String, id: String, size: Long,
                             partitionValues: Map[String, Option[String]],
                             version: Option[Long] = None,
                             timestamp: Option[Long] = None)

  private final case class ChangeAction(kind: String, file: ShareFile)

  final class Client(profile: Profile) {

    private def authed(): Map[String, String] = {
      profile.expirationTime.foreach { t =>
        val exp = try java.time.Instant.parse(t)
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"delta-sharing profile: unparseable expirationTime '$t'")
        }
        if (exp.isBefore(java.time.Instant.now()))
          throw new IllegalArgumentException(
            s"delta-sharing profile expired at $t — ask the provider " +
              "for a fresh profile")
      }
      Map("Authorization" -> s"Bearer ${profile.bearerToken}")
    }

    private def http(method: String, u: String,
                     body: Option[String]): (Int, String,
        Map[String, String]) = {
      val conn = new java.net.URL(u).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestMethod(method)
      authed().foreach { case (k, v) => conn.setRequestProperty(k, v) }
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
      import scala.jdk.CollectionConverters._
      val headers = conn.getHeaderFields.asScala.collect {
        case (k, v) if k != null && !v.isEmpty => k -> v.get(0)
      }.toMap
      if (code == 401 || code == 403)
        throw new IllegalArgumentException(
          s"delta-sharing server rejected the bearer token (HTTP " +
            s"$code) at $u")
      (code, text, headers)
    }

    private def expect200(method: String, u: String,
                          body: Option[String] = None)
        : (String, Map[String, String]) = {
      val (code, text, headers) = http(method, u, body)
      if (code != 200)
        throw new IllegalArgumentException(
          s"delta-sharing request $method $u failed: HTTP $code $text")
      (text, headers)
    }

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, "UTF-8")

    private def paged(base: String): Seq[JValue] = {
      val out = Seq.newBuilder[JValue]
      var token: Option[String] = None
      var pages = 0
      var done = false
      while (!done) {
        pages += 1
        if (pages > 10000)
          throw new IllegalStateException(
            s"delta-sharing listing at $base exceeded 10000 pages — " +
              "the server is looping its nextPageToken")
        val sep = if (base.contains('?')) "&" else "?"
        val u = token.fold(base)(t => s"$base${sep}pageToken=${enc(t)}")
        val (text, _) = expect200("GET", u)
        val j = JsonMethods.parse(text)
        (j \ "items") match {
          case JArray(xs) => xs.foreach(out += _)
          case _ => ()
        }
        (j \ "nextPageToken") match {
          case JString(t) if t.nonEmpty && !token.contains(t) =>
            token = Some(t)
          case _ => done = true
        }
      }
      out.result()
    }

    private def names(items: Seq[JValue]): Seq[String] =
      items.flatMap(i => i \ "name" match {
        case JString(n) => Some(n)
        case _ => None
      })

    private def withMax(base: String, maxResults: Option[Int]): String =
      maxResults.fold(base)(n => s"$base?maxResults=$n")

    def listShares(maxResults: Option[Int] = None): Seq[String] =
      names(paged(withMax(s"${profile.endpoint}/shares", maxResults)))

    def listSchemas(share: String,
                    maxResults: Option[Int] = None): Seq[String] =
      names(paged(withMax(
        s"${profile.endpoint}/shares/${enc(share)}/schemas", maxResults)))

    def listTables(share: String, schema: String,
                   maxResults: Option[Int] = None): Seq[String] =
      names(paged(withMax(s"${profile.endpoint}/shares/${enc(share)}" +
        s"/schemas/${enc(schema)}/tables", maxResults)))

    private def tableUrl(share: String, schema: String,
                         table: String): String =
      s"${profile.endpoint}/shares/${enc(share)}/schemas/${
        enc(schema)}/tables/${enc(table)}"

    /** `GET .../version` — the provider's current table version, from
      * the `Delta-Table-Version` response header. */
    def tableVersion(share: String, schema: String,
                     table: String): Long = {
      val (_, headers) = expect200("GET",
        s"${tableUrl(share, schema, table)}/version")
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Delta-Table-Version") =>
          v.toLong
      }.getOrElse(throw new IllegalArgumentException(
        "delta-sharing version response carries no " +
          "Delta-Table-Version header"))
    }

    private def parseMetaLines(lines: Seq[JValue],
                               where: String): ShareMeta = {
      val minReader = lines.collectFirst {
        case l if (l \ "protocol") != JNothing =>
          (l \ "protocol" \ "minReaderVersion") match {
            case JInt(v) => v.toInt
            case _ => 1
          }
      }.getOrElse(throw new IllegalArgumentException(
        s"delta-sharing $where response carries no protocol line"))
      if (minReader > 1)
        throw new UnsupportedDeltaFeatureException(
          s"delta-sharing $where: the provider requires " +
            s"minReaderVersion $minReader — this client speaks the " +
            "version-1 parquet response format (deletion vectors and " +
            "column mapping need the delta format)")
      lines.collectFirst {
        case l if (l \ "metaData") != JNothing =>
          val m = l \ "metaData"
          val id = m \ "id" match {
            case JString(s) => s
            case _ => ""
          }
          val schemaStr = m \ "schemaString" match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException(
              s"delta-sharing $where metaData carries no schemaString")
          }
          val schema = DataType.fromJson(schemaStr).asInstanceOf[StructType]
          val parts = m \ "partitionColumns" match {
            case JArray(xs) => xs.collect { case JString(s) => s }
            case _ => Nil
          }
          val cfg = m \ "configuration" match {
            case JObject(fields) => fields.collect {
              case (k, JString(v)) => k -> v
            }.toMap
            case _ => Map.empty[String, String]
          }
          val ver = m \ "version" match {
            case JInt(v) => Some(v.toLong)
            case JLong(v) => Some(v)
            case _ => None
          }
          ShareMeta(id, schema, parts, cfg, ver)
      }.getOrElse(throw new IllegalArgumentException(
        s"delta-sharing $where response carries no metaData line"))
    }

    private def ndjson(text: String): Seq[JValue] =
      text.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
        .map(JsonMethods.parse(_))

    /** `GET .../metadata` — protocol + metaData lines. */
    def tableMetadata(share: String, schema: String,
                      table: String): ShareMeta = {
      val (text, _) = expect200("GET",
        s"${tableUrl(share, schema, table)}/metadata")
      parseMetaLines(ndjson(text), "metadata")
    }

    private def parseFile(v: JValue): ShareFile = {
      def str(j: JValue) = j match {
        case JString(s) => Some(s)
        case _ => None
      }
      def num(j: JValue): Option[Long] = j match {
        case JInt(n) => Some(n.toLong)
        case JLong(n) => Some(n)
        case _ => None
      }
      val pv = v \ "partitionValues" match {
        case JObject(fields) => fields.map {
          case (k, JString(s)) => k -> Some(s)
          case (k, _) => k -> None
        }.toMap
        case _ => Map.empty[String, Option[String]]
      }
      ShareFile(
        url = str(v \ "url").getOrElse(
          throw new IllegalArgumentException(
            "delta-sharing file action carries no url")),
        id = str(v \ "id").getOrElse(""),
        size = num(v \ "size").getOrElse(0L),
        partitionValues = pv,
        version = num(v \ "version"),
        timestamp = num(v \ "timestamp"))
    }

    /** `POST .../query` — the table's file list (+ metadata) at the
      * current or a pinned `version`. `predicateHints` and
      * `limitHint` ride the request; the protocol lets servers treat
      * both as best-effort, so callers must keep their own filters —
      * the SQL door does, its WHERE stays in the plan. */
    def queryTableFiles(share: String, schema: String, table: String,
                        version: Option[Long] = None,
                        predicateHints: Seq[String] = Nil,
                        limitHint: Option[Long] = None)
        : (ShareMeta, Seq[ShareFile]) = {
      val hints =
        if (predicateHints.isEmpty) ""
        else s""""predicateHints":${predicateHints.map(jq)
          .mkString("[", ",", "]")},"""
      val limit = limitHint.fold("")(n => s""""limitHint":$n,""")
      val ver = version.fold("")(v => s""""version":$v,""")
      val body = s"{$hints$limit$ver}".replaceAll(",}$", "}")
      val (text, _) = expect200("POST",
        s"${tableUrl(share, schema, table)}/query", Some(body))
      val lines = ndjson(text)
      val meta = parseMetaLines(lines, "query")
      val files = lines.collect {
        case l if (l \ "file") != JNothing => parseFile(l \ "file")
      }
      (meta, files)
    }

    /** The shared table as a DataFrame — one driver POST for the
      * file list, then an ordinary distributed parquet scan over
      * [[GraftShareFs]] paths. */
    def queryTable(spark: SparkSession, share: String, schema: String,
                   table: String, version: Option[Long] = None,
                   predicateHints: Seq[String] = Nil,
                   limitHint: Option[Long] = None): DataFrame = {
      val (meta, files) = queryTableFiles(share, schema, table,
        version, predicateHints, limitHint)
      GraftShareFs.install(spark)
      assemble(spark, meta.schema, meta.partitionColumns, files)
    }

    /** `GET .../changes` — the change feed reassembled exactly as
      * [[DeltaInterop.changeFeed]] serves it locally: per version,
      * cdf actions supersede add/remove derivation; adds read as
      * inserts; removes read as deletes from the pre-image file. */
    def tableChanges(spark: SparkSession, share: String,
                     schema: String, table: String,
                     startingVersion: Long,
                     endingVersion: Option[Long] = None): DataFrame = {
      val range = s"startingVersion=$startingVersion" +
        endingVersion.fold("")(v => s"&endingVersion=$v")
      val (text, _) = expect200("GET",
        s"${tableUrl(share, schema, table)}/changes?$range")
      val lines = ndjson(text)
      val meta = parseMetaLines(lines, "changes")
      val actions = lines.flatMap { l =>
        Seq("add", "cdf", "remove").flatMap(k =>
          if ((l \ k) != JNothing) Some(ChangeAction(k, parseFile(l \ k)))
          else None)
      }
      GraftShareFs.install(spark)
      val cdfSchema = StructType(meta.schema.fields :+
        StructField("_change_type", StringType))
      val batches = actions.groupBy(_.file.version.getOrElse(
        throw new IllegalArgumentException(
          "delta-sharing change action carries no version")))
        .toSeq.sortBy(_._1).map { case (v, acts) =>
          val ts = acts.head.file.timestamp.getOrElse(0L)
          val cdf = acts.filter(_.kind == "cdf")
          val batch =
            if (cdf.nonEmpty)
              assemble(spark, cdfSchema, meta.partitionColumns,
                cdf.map(_.file))
            else {
              val ins = acts.filter(_.kind == "add")
              val del = acts.filter(_.kind == "remove")
              val parts = Seq(
                if (ins.isEmpty) None
                else Some(assemble(spark, meta.schema,
                  meta.partitionColumns, ins.map(_.file))
                  .withColumn("_change_type", lit("insert"))),
                if (del.isEmpty) None
                else Some(assemble(spark, meta.schema,
                  meta.partitionColumns, del.map(_.file))
                  .withColumn("_change_type", lit("delete")))).flatten
              parts.reduce(_ unionByName _)
            }
          batch.withColumn("_commit_version", lit(v))
            .withColumn("_commit_timestamp", timestamp_millis(lit(ts)))
        }
      if (batches.isEmpty) {
        val outSchema = StructType(cdfSchema.fields ++ Seq(
          StructField("_commit_version", LongType),
          StructField("_commit_timestamp", TimestampType)))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], outSchema)
      } else batches.reduce(_ unionByName _)
    }

    private def jq(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    /** Group files by partition tuple, scan each group's parquet
      * under the DATA schema, re-attach the tuple as cast literals —
      * the [[DeltaInterop.filesToDF]] shape over presigned urls. */
    private def assemble(spark: SparkSession, schema: StructType,
                         partCols: Seq[String],
                         files: Seq[ShareFile]): DataFrame = {
      if (files.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      val dataSchema = StructType(
        schema.fields.filterNot(f => partCols.contains(f.name)))
      val groups = files.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      val frames = groups.map { case (pv, fs) =>
        val paths = fs.map(f => GraftShareFs.wrap(f.url, f.size))
        val base = spark.read.schema(dataSchema).parquet(paths: _*)
        partCols.foldLeft(base) { (acc, c) =>
          val dt = schema(c).dataType
          acc.withColumn(c, lit(pv.get(c).flatten.orNull).cast(dt))
        }
      }
      frames.reduce(_ unionByName _)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  // ---- SQL door -----------------------------------------------------

  /** `SELECT … FROM graft_delta_sharing.<alias> [VERSION AS OF n]` —
    * every query re-POSTs for the provider-current file list, then
    * plans the ordinary distributed parquet scan. Read-only: the
    * protocol has no write verb, so INSERT/DML refuse by name. */
  val Namespace = "graft_delta_sharing"

  private val sqlTables = new java.util.concurrent
    .ConcurrentHashMap[String, (Client, String, String, String)]()

  def register(alias: String, client: Client, share: String,
               schema: String, table: String): Unit =
    sqlTables.put(alias.toLowerCase(java.util.Locale.ROOT),
      (client, share, schema, table)): Unit

  def unregister(alias: String): Unit =
    sqlTables.remove(alias.toLowerCase(java.util.Locale.ROOT)): Unit

  private def sqlEntry(alias: String)
      : Option[(Client, String, String, String)] =
    Option(sqlTables.get(alias.toLowerCase(java.util.Locale.ROOT)))

  final class DeltaSharingSqlRule(spark: SparkSession)
      extends Rule[LogicalPlan] {

    private def target(plan: LogicalPlan)
        : Option[(Client, String, String, String)] = plan match {
      case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase(Namespace) =>
        sqlEntry(u.multipartIdentifier(1))
      case _ => None
    }

    private def isShared(plan: LogicalPlan): Boolean = plan match {
      case u: UnresolvedRelation =>
        u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase(Namespace)
      case org.apache.spark.sql.catalyst.plans.logical
        .SubqueryAlias(_, child) => isShared(child)
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case i: org.apache.spark.sql.catalyst.plans.logical
        .InsertIntoStatement if isShared(i.table) =>
        throw new UnsupportedOperationException(
          s"$Namespace is READ-ONLY — Delta Sharing has no write " +
            "verb; writes belong to the provider's own engine")
      case d: org.apache.spark.sql.catalyst.plans.logical
        .DeleteFromTable if isShared(d.table) =>
        throw new UnsupportedOperationException(
          s"$Namespace is READ-ONLY — Delta Sharing has no write verb")
      case u: org.apache.spark.sql.catalyst.plans.logical
        .UpdateTable if isShared(u.table) =>
        throw new UnsupportedOperationException(
          s"$Namespace is READ-ONLY — Delta Sharing has no write verb")
      case m: org.apache.spark.sql.catalyst.plans.logical
        .MergeIntoTable if isShared(m.targetTable) =>
        throw new UnsupportedOperationException(
          s"$Namespace is READ-ONLY — Delta Sharing has no write verb")
      case _ => plan.resolveOperatorsUp {
        case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if target(u).isDefined =>
          val (c, sh, sc, t) = target(u).get
          val ver = scala.util.Try(java.lang.Long.parseLong(v))
            .getOrElse(throw new UnsupportedOperationException(
              s"$Namespace VERSION AS OF expects an integer, got $v"))
          PlanBridge.analyzedPlan(
            c.queryTable(spark, sh, sc, t, Some(ver)))
        case u: UnresolvedRelation if target(u).isDefined =>
          val (c, sh, sc, t) = target(u).get
          PlanBridge.analyzedPlan(c.queryTable(spark, sh, sc, t))
      }
    }
  }
}
