package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg VIEW spec (v1) — versioned, engine-portable view metadata:
  * a view directory holds `metadata/v<N>.metadata.json` documents
  * (same commit discipline as tables: rename-if-absent + a
  * version-hint), each carrying the full `versions` list with SQL
  * REPRESENTATIONS, a `schemas` list, `current-version-id` and the
  * append-only `version-log`. This implementation:
  *
  *  - CREATE / REPLACE write spec-shaped v1 metadata with one `sql`
  *    representation (dialect `spark`); REPLACE appends a NEW version
  *    (prior versions stay addressable — the spec's versioning model,
  *    not an overwrite);
  *  - reads resolve the CURRENT version's Spark-dialect SQL and plan
  *    it in-session (a view over `graft_iceberg.*` / `graft_delta.*`
  *    / `graft_lake.*` tables resolves through those extensions);
  *    `readVersion` time-travels to any retained version;
  *  - FOREIGN view metadata is served when a `spark` (or
  *    dialect-less) SQL representation exists; views carrying only
  *    other dialects refuse BY NAME — planning Trino SQL as Spark
  *    would be silently wrong;
  *  - format-version != 1 refuses by name.
  *
  * Everything is metadata-only until the view is READ; the planned
  * query is whatever the SQL says — no materialization.
  */
object IcebergViews {

  final class UnsupportedIcebergViewException(msg: String)
    extends RuntimeException(msg)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def currentVersion(fs: FileSystem, metaDir: Path): Option[Long] = {
    val hint = new Path(metaDir, "version-hint.text")
    val hinted =
      if (!fs.exists(hint)) None
      else scala.util.Try(readText(fs, hint).trim.toLong)
        .toOption.filter(v =>
          fs.exists(new Path(metaDir, s"v$v.metadata.json")))
    hinted.orElse {
      if (!fs.exists(metaDir)) None
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
        .sorted.lastOption
    }
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def jstr(s: String): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JString(s)))

  private def jLong(v: org.json4s.JValue): Long = {
    import org.json4s._
    v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case _ => -1L
    }
  }

  /** CREATE (or, with `replace`, version forward) a view whose body
    * is `sql`. The schema is derived by PLANNING the SQL now — a
    * body that does not resolve refuses at create, not at first
    * read. Returns the new current version id. */
  def create(spark: SparkSession, path: String, sql: String,
             properties: Map[String, String] = Map.empty,
             replace: Boolean = false): Long = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val metaDir = new Path(root, "metadata")
    val existing = currentVersion(fs, metaDir)
    if (existing.isDefined && !replace)
      throw new IllegalArgumentException(
        s"view $path already exists — pass replace=true to version it")
    // plan NOW: the schema is recorded per version
    val planned = spark.sql(sql)
    val now = System.currentTimeMillis()
    val (priorVersions, priorLog, uuid, nextId, priorSchemas) =
      existing match {
        case Some(v) =>
          val m = JsonMethods.parse(readText(fs,
            new Path(metaDir, s"v$v.metadata.json")))
          val versions = (m \ "versions") match {
            case JArray(xs) => xs
            case _ => Nil
          }
          val log = (m \ "version-log") match {
            case JArray(xs) => xs
            case _ => Nil
          }
          val u = (m \ "view-uuid") match {
            case JString(s0) => s0
            case _ => java.util.UUID.randomUUID().toString
          }
          val maxId = versions.map(vn => jLong(vn \ "version-id"))
            .foldLeft(0L)(_ max _)
          val schemas = (m \ "schemas") match {
            case JArray(xs) => xs
            case _ => Nil
          }
          (versions, log, u, maxId + 1, schemas)
        case None =>
          (Nil, Nil, java.util.UUID.randomUUID().toString, 1L, Nil)
      }
    // schema ids are per-version: this version's schema appends under
    // the next schema-id (the table-side schema serializer is reused)
    val schemaId = priorSchemas.map(s0 => jLong(s0 \ "schema-id"))
      .foldLeft(-1L)(_ max _) + 1
    val schemaNode: JValue = JsonMethods.parse(
      IcebergInterop.icebergSchemaJson(planned.schema, schemaId))
    val versionNode: JValue = JObject(List(
      "version-id" -> (JLong(nextId): JValue),
      "timestamp-ms" -> (JLong(now): JValue),
      "schema-id" -> (JLong(schemaId): JValue),
      "summary" -> (JObject(List(
        "operation" -> (JString(
          if (existing.isDefined) "replace" else "create"): JValue),
        "engine-name" -> (JString("graft"): JValue))): JValue),
      "representations" -> (JArray(List(JObject(List(
        "type" -> (JString("sql"): JValue),
        "sql" -> (JString(sql): JValue),
        "dialect" -> (JString("spark"): JValue))))): JValue),
      "default-namespace" -> (JArray(Nil): JValue)))
    val logEntry: JValue = JObject(List(
      "timestamp-ms" -> (JLong(now): JValue),
      "version-id" -> (JLong(nextId): JValue)))
    val doc = JObject(List(
      "view-uuid" -> (JString(uuid): JValue),
      "format-version" -> (JInt(1): JValue),
      "location" -> (JString(root.toString): JValue),
      "schemas" -> (JArray((priorSchemas :+ schemaNode).toList): JValue),
      "current-version-id" -> (JLong(nextId): JValue),
      "versions" -> (JArray((priorVersions :+ versionNode).toList): JValue),
      "version-log" -> (JArray((priorLog :+ logEntry).toList): JValue),
      "properties" -> (JObject(properties.toList.sortBy(_._1).map {
        case (k, v) => k -> (JString(v): JValue) }): JValue)))
    val nextFile = existing.getOrElse(0L) + 1
    fs.mkdirs(metaDir)
    val target = new Path(metaDir, s"v$nextFile.metadata.json")
    val tmp = new Path(metaDir,
      s".v$nextFile.metadata.json.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(JsonMethods.compact(JsonMethods.render(doc))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!ManifestLake.RenameCommit.publish(fs, tmp, target)) {
      fs.delete(tmp, false)
      throw new IcebergInterop.ConcurrentIcebergCommitException(
        s"view metadata v$nextFile of $path was committed " +
          "concurrently — re-read and retry")
    }
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(nextFile.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    nextId
  }

  /** The current version's SQL (spark dialect), or the named
    * version's. Foreign views without a servable representation
    * refuse by name. */
  def sqlOf(spark: SparkSession, path: String,
            versionId: Option[Long] = None): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val metaDir = new Path(root, "metadata")
    val v = currentVersion(fs, metaDir).getOrElse(
      throw new IllegalArgumentException(
        s"not an Iceberg view: no metadata under $path"))
    val m = JsonMethods.parse(readText(fs,
      new Path(metaDir, s"v$v.metadata.json")))
    val fv = jLong(m \ "format-version")
    if (fv != 1L)
      throw new UnsupportedIcebergViewException(
        s"view $path is format-version $fv — v1 is the supported " +
          "view spec")
    val wantId = versionId.getOrElse(jLong(m \ "current-version-id"))
    val version = (m \ "versions") match {
      case JArray(xs) => xs.find(vn => jLong(vn \ "version-id") == wantId)
        .getOrElse(throw new IllegalArgumentException(
          s"view $path retains no version $wantId"))
      case _ => throw new IllegalArgumentException(
        s"view $path metadata lists no versions")
    }
    val reps = (version \ "representations") match {
      case JArray(xs) => xs
      case _ => Nil
    }
    reps.collectFirst {
      case r if ((r \ "type") == JString("sql")) &&
        ((r \ "dialect") match {
          case JString(d) => d.equalsIgnoreCase("spark")
          case _ => true // dialect-less SQL: assume portable
        }) => (r \ "sql") match {
        case JString(s0) => s0
        case _ => throw new UnsupportedIcebergViewException(
          s"view $path version $wantId carries a malformed sql " +
            "representation")
      }
    }.getOrElse {
      val dialects = reps.flatMap(r => (r \ "dialect") match {
        case JString(d) => Some(d)
        case _ => None
      })
      throw new UnsupportedIcebergViewException(
        s"view $path version $wantId has no spark-dialect SQL " +
          s"representation (found: ${dialects.mkString(", ")}) — " +
          "planning another engine's dialect would be silently wrong")
    }
  }

  // planning a view's SQL can resolve OTHER views (legitimate
  // nesting) — or itself, directly or mutually, which would recurse
  // without bound. The per-thread resolution stack refuses cycles by
  // name instead of overflowing.
  private val resolving = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  private def planGuarded(spark: SparkSession, path: String,
                          sql: String): DataFrame = {
    val key = new Path(path).toString
    val stack = resolving.get()
    if (stack.contains(key))
      throw new UnsupportedIcebergViewException(
        s"view $key references itself (resolution cycle: " +
          s"${(key :: stack).reverse.mkString(" -> ")}) — cyclic view " +
          "definitions cannot be planned")
    resolving.set(key :: stack)
    try spark.sql(sql)
    finally resolving.set(stack)
  }

  /** Plan the view's CURRENT version in this session. */
  def read(spark: SparkSession, path: String): DataFrame =
    planGuarded(spark, path, sqlOf(spark, path))

  /** Plan a RETAINED version — the view's own time travel. */
  def readVersion(spark: SparkSession, path: String,
                  versionId: Long): DataFrame =
    planGuarded(spark, path, sqlOf(spark, path, Some(versionId)))

  /** `(version-id, timestamp-ms)` rows of the version-log. */
  def versionLog(spark: SparkSession, path: String): Seq[(Long, Long)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val metaDir = new Path(root, "metadata")
    val v = currentVersion(fs, metaDir).getOrElse(
      throw new IllegalArgumentException(
        s"not an Iceberg view: no metadata under $path"))
    val m = JsonMethods.parse(readText(fs,
      new Path(metaDir, s"v$v.metadata.json")))
    (m \ "version-log") match {
      case JArray(xs) => xs.map(e =>
        (jLong(e \ "version-id"), jLong(e \ "timestamp-ms")))
      case _ => Nil
    }
  }
}
