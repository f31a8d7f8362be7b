package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Drives [[IcebergRestCatalog.Client]] against a LOCAL stub REST
  * catalog at the HTTP level (the S3CommitSpec pattern): the stub
  * stores TableMetadata per table, serves the OpenAPI's
  * `LoadTableResult` (metadata inline) on GET, and applies
  * `CommitTableRequest` updates on POST after checking the
  * requirements — a failed `assert-ref-snapshot-id` answers 409,
  * exactly the optimistic-concurrency contract. Pins: read
  * round-trip, append commit, DML commit, schema-evolution commit,
  * and the 409 → re-load → replay retry where BOTH racers' rows
  * land. */
class IcebergRestCatalogSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  /** Minimal REST catalog: metadata JValue per "ns.name", requirement
    * checks + update application under a lock (a real catalog's
    * transactional backend). */
  private final class StubCatalog(requireAuth: Boolean = false,
                                  tokenTtlSec: Long = 3600L,
                                  pageSize: Int = 0) {
    val tables =
      new java.util.concurrent.ConcurrentHashMap[String, JValue]()
    val commits = new java.util.concurrent.atomic.AtomicLong()
    val tokenFetches = new java.util.concurrent.atomic.AtomicLong()
    private val issued =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)

    private def jnum(v: JValue): Long = v match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => -1L
    }

    private def apply(meta: JValue, updates: Seq[JValue]): JValue =
      updates.foldLeft(meta) { (m, u) =>
        val obj = m.asInstanceOf[JObject].obj
        def set(k: String, v: JValue): JValue =
          JObject(obj.filterNot(_._1 == k) :+ (k -> v))
        (u \ "action") match {
          case JString("upgrade-format-version") =>
            val m2 = set("format-version", u \ "format-version")
            if ((m2 \ "last-sequence-number") == JNothing)
              JObject(m2.asInstanceOf[JObject].obj :+
                ("last-sequence-number" -> (JLong(0L): JValue)))
            else m2
          case JString("add-schema") =>
            val schemas = (m \ "schemas") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            val lci = ((u \ "schema" \ "fields") match {
              case JArray(fs) => fs.map(f => jnum(f \ "id"))
              case _ => Nil
            }).foldLeft(jnum(m \ "last-column-id"))(_ max _)
            JObject(set("schemas",
              JArray(schemas :+ (u \ "schema")))
              .asInstanceOf[JObject].obj
              .filterNot(_._1 == "last-column-id") :+
              ("last-column-id" -> (JLong(lci): JValue)))
          case JString("set-current-schema") =>
            // -1 = "last added" per the REST spec (a renumbering
            // server resolves it to the id IT assigned)
            val want = jnum(u \ "schema-id") match {
              case -1L => (m \ "schemas") match {
                case JArray(xs) if xs.nonEmpty =>
                  JLong(jnum(xs.last \ "schema-id")): JValue
                case _ => u \ "schema-id"
              }
              case _ => u \ "schema-id"
            }
            set("current-schema-id", want)
          case JString("add-spec") =>
            val specs = (m \ "partition-specs") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            set("partition-specs", JArray(specs :+ (u \ "spec")))
          case JString("set-default-spec") =>
            val want = jnum(u \ "spec-id") match {
              case -1L => (m \ "partition-specs") match {
                case JArray(xs) if xs.nonEmpty =>
                  JLong(jnum(xs.last \ "spec-id")): JValue
                case _ => u \ "spec-id"
              }
              case _ => u \ "spec-id"
            }
            set("default-spec-id", want)
          case JString("add-sort-order") =>
            val orders = (m \ "sort-orders") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            // the server ASSIGNS the order id (renumbering allowed,
            // like add-schema) — here: max existing + 1
            val assigned = orders.map(o => jnum(o \ "order-id"))
              .foldLeft(0L)(_ max _) + 1
            val reshaped = (u \ "sort-order") match {
              case JObject(kvs) => JObject(kvs.map {
                case ("order-id", _) =>
                  "order-id" -> (JLong(assigned): JValue)
                case kv => kv
              })
              case other => other
            }
            set("sort-orders", JArray(orders :+ reshaped))
          case JString("set-default-sort-order") =>
            val want = jnum(u \ "sort-order-id") match {
              case -1L => (m \ "sort-orders") match {
                case JArray(xs) if xs.nonEmpty =>
                  JLong(jnum(xs.last \ "order-id")): JValue
                case _ => u \ "sort-order-id"
              }
              case _ => u \ "sort-order-id"
            }
            set("default-sort-order-id", want)
          case JString("set-statistics") =>
            val sid = jnum(u \ "snapshot-id")
            val cur = (m \ "statistics") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            set("statistics", JArray(cur.filterNot(e =>
              jnum(e \ "snapshot-id") == sid) :+ (u \ "statistics")))
          case JString("remove-statistics") =>
            val sid = jnum(u \ "snapshot-id")
            val cur = (m \ "statistics") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            set("statistics", JArray(cur.filterNot(e =>
              jnum(e \ "snapshot-id") == sid)))
          case JString("remove-snapshots") =>
            val gone = (u \ "snapshot-ids") match {
              case JArray(xs) => xs.map(jnum).toSet
              case _ => Set.empty[Long]
            }
            val kept = (m \ "snapshots") match {
              case JArray(xs) =>
                xs.filterNot(s => gone(jnum(s \ "snapshot-id")))
              case _ => Nil
            }
            set("snapshots", JArray(kept))
          case JString("remove-snapshot-ref") =>
            val rname = (u \ "ref-name") match {
              case JString(r) => r
              case _ => ""
            }
            val kept = (m \ "refs") match {
              case JObject(kvs) => kvs.filterNot(_._1 == rname)
              case _ => Nil
            }
            set("refs", JObject(kept))
          case JString("add-snapshot") =>
            val snaps = (m \ "snapshots") match {
              case JArray(xs) => xs
              case _ => Nil
            }
            val seq = jnum(u \ "snapshot" \ "sequence-number")
            val m2 = set("snapshots", JArray(snaps :+ (u \ "snapshot")))
            if (seq > jnum(m \ "last-sequence-number"))
              JObject(m2.asInstanceOf[JObject].obj
                .filterNot(_._1 == "last-sequence-number") :+
                ("last-sequence-number" -> (JLong(seq): JValue)))
            else m2
          case JString("set-snapshot-ref") =>
            val rname = (u \ "ref-name") match {
              case JString(r) => r
              case _ => "main"
            }
            val refs = (m \ "refs") match {
              case JObject(kvs) => kvs
              case _ => Nil
            }
            val m2 = set("refs", JObject(
              refs.filterNot(_._1 == rname) :+ (rname -> (JObject(List(
                "snapshot-id" -> (u \ "snapshot-id"),
                "type" -> (u \ "type"))): JValue))))
            if (rname == "main")
              JObject(m2.asInstanceOf[JObject].obj
                .filterNot(_._1 == "current-snapshot-id") :+
                ("current-snapshot-id" -> (u \ "snapshot-id")))
            else m2
          case JString("set-properties") =>
            val cur = (m \ "properties") match {
              case JObject(kvs) => kvs
              case _ => Nil
            }
            val upd = (u \ "updates") match {
              case JObject(kvs) => kvs
              case _ => Nil
            }
            set("properties", JObject(
              cur.filterNot(kv => upd.exists(_._1 == kv._1)) ++ upd))
          case JString("remove-properties") =>
            val cur = (m \ "properties") match {
              case JObject(kvs) => kvs
              case _ => Nil
            }
            val gone = (u \ "removals") match {
              case JArray(xs) => xs.collect { case JString(k) => k }.toSet
              case _ => Set.empty[String]
            }
            set("properties", JObject(cur.filterNot(kv => gone(kv._1))))
          case other =>
            throw new IllegalArgumentException(s"stub: unknown $other")
        }
      }

    server.createContext("/", {
      exchange: com.sun.net.httpserver.HttpExchange =>
      val segs = exchange.getRequestURI.getPath.split('/')
        .filter(_.nonEmpty)
      def respond(code: Int, body: String): Unit = {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(code,
          if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) {
          val out = exchange.getResponseBody
          try out.write(bytes) finally out.close()
        }
        exchange.close()
      }
      val isTokenReq = segs.length == 3 && segs(1) == "oauth" &&
        segs(2) == "tokens" && exchange.getRequestMethod == "POST"
      // a page of `all`, honoring ?pageToken=<index>
      def page(all: Seq[JValue], field: String): String = {
        val from = Option(exchange.getRequestURI.getQuery).toSeq
          .flatMap(_.split('&')).collectFirst {
            case q if q.startsWith("pageToken=") =>
              q.stripPrefix("pageToken=").toInt
          }.getOrElse(0)
        val slice =
          if (pageSize <= 0) all.drop(from) else all.slice(from,
            from + pageSize)
        val next =
          if (pageSize > 0 && from + pageSize < all.size)
            List("next-page-token" ->
              (JString((from + pageSize).toString): JValue))
          else Nil
        JsonMethods.compact(JsonMethods.render(JObject(
          (field -> (JArray(slice.toList): JValue)) :: next)))
      }
      if (isTokenReq) {
        tokenFetches.incrementAndGet()
        val tok = s"stub-token-${tokenFetches.get()}"
        issued.add(tok): Unit
        respond(200, JsonMethods.compact(JsonMethods.render(JObject(List(
          "access_token" -> JString(tok),
          "token_type" -> JString("bearer"),
          "expires_in" -> JLong(tokenTtlSec))))))
      } else if (requireAuth && {
        val h = Option(exchange.getRequestHeaders
          .getFirst("Authorization")).getOrElse("")
        !h.startsWith("Bearer ") || !issued.contains(
          h.stripPrefix("Bearer "))
      }) respond(401, """{"error":"unauthorized"}""")
      else if (segs.length == 2 && segs(1) == "namespaces" &&
        exchange.getRequestMethod == "GET") {
        import scala.jdk.CollectionConverters._
        val nss = tables.keySet.asScala.toSeq.map(_.split('.').head)
          .distinct.sorted
          .map(n => JArray(List(JString(n))): JValue)
        respond(200, page(nss, "namespaces"))
      } else if (segs.length == 4 && segs(3) == "tables" &&
        exchange.getRequestMethod == "GET") {
        import scala.jdk.CollectionConverters._
        val ns = segs(2)
        val names = tables.keySet.asScala.toSeq
          .filter(_.startsWith(s"$ns.")).map(_.split('.')(1)).sorted
          .map(n => JObject(List(
            "namespace" -> (JArray(List(JString(ns))): JValue),
            "name" -> (JString(n): JValue))): JValue)
        respond(200, page(names, "identifiers"))
      } else {
      // /v1/namespaces/{ns}/tables → CREATE; …/tables/{name} → table ops
      val isCreate =
        segs.length == 4 && exchange.getRequestMethod == "POST"
      if (isCreate) {
        val req = JsonMethods.parse(new String(
          exchange.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8))
        val name = (req \ "name") match {
          case JString(n) => n
          case _ => ""
        }
        val key = s"${segs(2)}.$name"
        tables.synchronized {
          if (tables.containsKey(key))
            respond(409, """{"error":"table exists"}""")
          else {
            val lci = ((req \ "schema" \ "fields") match {
              case JArray(fs) => fs.map(f => jnum(f \ "id"))
              case _ => Nil
            }).foldLeft(0L)(_ max _)
            val meta = JObject(List(
              "format-version" -> JInt(2),
              "table-uuid" -> JString(
                java.util.UUID.randomUUID().toString),
              "location" -> JString(s"stub://$key"),
              "last-updated-ms" -> JInt(1),
              "last-column-id" -> JLong(lci),
              "last-sequence-number" -> JInt(0),
              "last-partition-id" -> JInt(1999),
              "default-sort-order-id" -> JInt(0),
              "sort-orders" -> JArray(List(JObject(List(
                "order-id" -> JInt(0), "fields" -> JArray(Nil))))),
              "schemas" -> JArray(List(req \ "schema")),
              "current-schema-id" -> JInt(0),
              "partition-specs" -> JArray(List(req \ "partition-spec")),
              "default-spec-id" -> JInt(0),
              "properties" -> (req \ "properties"),
              "current-snapshot-id" -> JInt(-1),
              "snapshots" -> JArray(Nil)))
            tables.put(key, meta)
            respond(200, JsonMethods.compact(JsonMethods.render(
              JObject(List("metadata-location" ->
                JString(s"stub://$key/0"), "metadata" -> meta)))))
          }
        }
      } else {
      val key = s"${segs(2)}.${segs(4)}"
      exchange.getRequestMethod match {
        case "GET" =>
          Option(tables.get(key)) match {
            case None => respond(404, """{"error":"no such table"}""")
            case Some(meta) => respond(200, JsonMethods.compact(
              JsonMethods.render(JObject(List(
                "metadata-location" ->
                  JString(s"stub://$key/${commits.get()}"),
                "metadata" -> meta)))))
          }
        case "POST" =>
          val req = JsonMethods.parse(new String(
            exchange.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8))
          tables.synchronized {
            Option(tables.get(key)) match {
              case None => respond(404, """{"error":"no such table"}""")
              case Some(meta) =>
                val reqs = (req \ "requirements") match {
                  case JArray(xs) => xs
                  case _ => Nil
                }
                val failed = reqs.exists { r =>
                  (r \ "type") match {
                    case JString("assert-table-uuid") =>
                      (r \ "uuid") != (meta \ "table-uuid")
                    case JString("assert-ref-snapshot-id") =>
                      jnum(r \ "snapshot-id") !=
                        jnum(meta \ "current-snapshot-id")
                    case _ => true // unknown requirement: fail safe
                  }
                }
                if (failed)
                  respond(409, """{"error":"requirement failed"}""")
                else {
                  val updates = (req \ "updates") match {
                    case JArray(xs) => xs
                    case _ => Nil
                  }
                  tables.put(key, apply(meta, updates))
                  commits.incrementAndGet()
                  respond(200, JsonMethods.compact(JsonMethods.render(
                    JObject(List("metadata-location" ->
                      JString(s"stub://$key/${commits.get()}"),
                      "metadata" -> tables.get(key))))))
                }
            }
          }
        case _ => respond(405, "")
      }
      }
      }
    })
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    /** Seed the catalog from a local Hadoop-layout table's current
      * metadata (absolute file paths keep resolving). */
    def seed(ns: String, name: String, table: String): Unit = {
      val root = new Path(table)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      def slurp(p: Path): String = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      val hint = slurp(new Path(table,
        "metadata/version-hint.text")).trim
      tables.put(s"$ns.$name", JsonMethods.parse(
        slurp(new Path(table, s"metadata/v$hint.metadata.json"))))
    }
    def stop(): Unit = server.stop(0)
  }

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-rest").toString + "/t"

  private def withCatalog(test: (StubCatalog,
      IcebergRestCatalog.Client) => Unit): Unit = {
    val stub = new StubCatalog
    val client = new IcebergRestCatalog.Client(stub.endpoint)
    try test(stub, client) finally stub.stop()
  }

  test("load serves the catalog's metadata through the unchanged " +
    "read kernels; an append + DML + ALTER commit round-trips and a " +
    "fresh load serves the committed state") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i))
        .toDF("id", "v"), t)
      IcebergInterop.upgradeFormat(spark, t)
      stub.seed("lake", "orders", t)
      // read through the staged mirror — kernels unchanged
      val rt = client.loadTable(spark, "lake", "orders")
      IcebergInterop.read(spark, rt.localDir).count() shouldBe 10L
      // local append commits, then publishes to the catalog
      IcebergInterop.write(Seq((100L, 100L)).toDF("id", "v"),
        rt.localDir)
      client.commitTable(spark, "lake", "orders", rt)
      val rt2 = client.loadTable(spark, "lake", "orders")
      IcebergInterop.read(spark, rt2.localDir).count() shouldBe 11L
      // DML (CoW delete) through the catalog
      IcebergInterop.delete(spark, rt2.localDir, col("id") <= 3L)
      client.commitTable(spark, "lake", "orders", rt2)
      val rt3 = client.loadTable(spark, "lake", "orders")
      IcebergInterop.read(spark, rt3.localDir).count() shouldBe 8L
      // schema evolution (ALTER ADD COLUMN) through the catalog
      IcebergInterop.addColumn(spark, rt3.localDir, "w", LongType)
      client.commitTable(spark, "lake", "orders", rt3)
      val rt4 = client.loadTable(spark, "lake", "orders")
      val out = IcebergInterop.read(spark, rt4.localDir)
      out.columns.toSeq shouldBe Seq("id", "v", "w")
      out.filter(col("w").isNull).count() shouldBe 8L
    }
  }

  test("a commit whose base the catalog has moved past answers 409 " +
    "and raises the named conflict; appendWithRetry re-loads and " +
    "replays — both racers' rows land") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i))
        .toDF("id", "v"), t)
      stub.seed("lake", "racers", t)
      // both load the SAME base
      val a = client.loadTable(spark, "lake", "racers")
      val b = client.loadTable(spark, "lake", "racers")
      IcebergInterop.write(Seq((100L, 100L)).toDF("id", "v"), a.localDir)
      IcebergInterop.write(Seq((200L, 200L)).toDF("id", "v"), b.localDir)
      client.commitTable(spark, "lake", "racers", a)
      intercept[IcebergInterop.ConcurrentIcebergCommitException](
        client.commitTable(spark, "lake", "racers", b))
        .getMessage should include("409")
      // loser's snapshot never reached the catalog
      IcebergInterop.read(spark,
        client.loadTable(spark, "lake", "racers").localDir)
        .count() shouldBe 11L
      // the retry primitive: load → append → commit, replayed on 409
      client.appendWithRetry(spark, "lake", "racers",
        Seq((300L, 300L)).toDF("id", "v"))
      val fin = IcebergInterop.read(spark,
        client.loadTable(spark, "lake", "racers").localDir)
      fin.count() shouldBe 12L
      fin.filter(col("id") >= 100L).count() shouldBe 2L
    }
  }

  test("createTable registers an EMPTY table at the catalog; data " +
    "lands through load → append → commit; a duplicate create " +
    "answers 409; racing FIRST appends are guarded by the " +
    "null-snapshot assertion") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    withCatalog { (stub, client) =>
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      client.createTable(spark, "lake", "fresh", schema,
        properties = Map("owner" -> "graft"))
      // duplicate create → 409, named
      intercept[IllegalArgumentException](
        client.createTable(spark, "lake", "fresh", schema))
        .getMessage should include("409")
      // the empty table loads and serves zero rows
      val rt0 = client.loadTable(spark, "lake", "fresh")
      IcebergInterop.read(spark, rt0.localDir).count() shouldBe 0L
      // racing FIRST appends: both load the empty base, one wins
      val a = client.loadTable(spark, "lake", "fresh")
      val b = client.loadTable(spark, "lake", "fresh")
      IcebergInterop.write(Seq((1L, 1L)).toDF("id", "v"), a.localDir)
      IcebergInterop.write(Seq((2L, 2L)).toDF("id", "v"), b.localDir)
      client.commitTable(spark, "lake", "fresh", a)
      intercept[IcebergInterop.ConcurrentIcebergCommitException](
        client.commitTable(spark, "lake", "fresh", b))
      // the retry primitive lands the loser's row too
      client.appendWithRetry(spark, "lake", "fresh",
        Seq((2L, 2L)).toDF("id", "v"))
      val out = IcebergInterop.read(spark,
        client.loadTable(spark, "lake", "fresh").localDir)
      out.count() shouldBe 2L
      out.select("id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    }
  }

  test("SQL reads through the catalog: graft_iceberg_rest.<alias> " +
    "stages a fresh pointer fetch per query, so a commit published " +
    "through the client is visible to the NEXT SELECT") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i))
        .toDF("id", "v"), t)
      stub.seed("lake", "sqlt", t)
      IcebergRestCatalog.register("sql_orders", client, "lake", "sqlt")
      try {
        spark.sql(
          "SELECT count(*) AS n FROM graft_iceberg_rest.sql_orders")
          .head().getLong(0) shouldBe 10L
        client.appendWithRetry(spark, "lake", "sqlt",
          Seq((100L, 100L)).toDF("id", "v"))
        spark.sql(
          "SELECT count(*) AS n FROM graft_iceberg_rest.sql_orders")
          .head().getLong(0) shouldBe 11L
        spark.sql("SELECT sum(v) AS s FROM graft_iceberg_rest" +
          ".sql_orders WHERE id >= 100").head().getLong(0) shouldBe 100L
      } finally IcebergRestCatalog.unregister("sql_orders")
    }
  }

  test("SQL INSERT through the catalog: INSERT INTO " +
    "graft_iceberg_rest.<alias> lands via appendWithRetry and the " +
    "next SELECT serves it; INSERT OVERWRITE refuses by name") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i))
        .toDF("id", "v"), t)
      stub.seed("lake", "ins", t)
      IcebergRestCatalog.register("ins_t", client, "lake", "ins")
      try {
        spark.sql("INSERT INTO graft_iceberg_rest.ins_t " +
          "VALUES (CAST(100 AS BIGINT), CAST(100 AS BIGINT))")
        spark.sql(
          "SELECT count(*) AS n FROM graft_iceberg_rest.ins_t")
          .head().getLong(0) shouldBe 11L
        spark.sql("SELECT v FROM graft_iceberg_rest.ins_t " +
          "WHERE id = 100").head().getLong(0) shouldBe 100L
        intercept[UnsupportedOperationException](spark.sql(
          "INSERT OVERWRITE graft_iceberg_rest.ins_t VALUES (1, 1)"))
          .getMessage should include("APPENDS")
      } finally IcebergRestCatalog.unregister("ins_t")
    }
  }

  test("SQL DELETE and UPDATE through the catalog: kernel CoW DML " +
    "on a fresh mirror, published through mutateWithRetry") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i))
        .toDF("id", "v"), t)
      stub.seed("lake", "dml", t)
      IcebergRestCatalog.register("dml_t", client, "lake", "dml")
      try {
        spark.sql("DELETE FROM graft_iceberg_rest.dml_t WHERE id <= 3")
        spark.sql(
          "SELECT count(*) AS n FROM graft_iceberg_rest.dml_t")
          .head().getLong(0) shouldBe 7L
        spark.sql("UPDATE graft_iceberg_rest.dml_t SET v = v * 10 " +
          "WHERE id = 5")
        spark.sql("SELECT v FROM graft_iceberg_rest.dml_t " +
          "WHERE id = 5").head().getLong(0) shouldBe 50L
        // MERGE: one matched update, one insert
        Seq((5L, 555L), (50L, 500L)).toDF("id", "v")
          .createOrReplaceTempView("rest_merge_src")
        spark.sql("MERGE INTO graft_iceberg_rest.dml_t t " +
          "USING rest_merge_src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
        spark.sql("SELECT v FROM graft_iceberg_rest.dml_t " +
          "WHERE id = 5").head().getLong(0) shouldBe 555L
        spark.sql("SELECT count(*) AS n FROM graft_iceberg_rest.dml_t")
          .head().getLong(0) shouldBe 8L
        // the published state survives a completely fresh load
        IcebergInterop.read(spark,
          client.loadTable(spark, "lake", "dml").localDir)
          .count() shouldBe 8L
      } finally IcebergRestCatalog.unregister("dml_t")
    }
  }

  test("OAuth2 client-credentials: an unauthenticated client is " +
    "refused with 401; the oauth client fetches a bearer token, " +
    "reuses it while valid, and REFRESHES it when expires_in lapses") {
    import spark.implicits._
    val stub = new StubCatalog(requireAuth = true)
    try {
      val t = fresh()
      IcebergInterop.write((1L to 4L).map(i => (i, i)).toDF("id", "v"), t)
      stub.seed("lake", "auth", t)
      val anon = new IcebergRestCatalog.Client(stub.endpoint)
      intercept[IllegalArgumentException](
        anon.loadTable(spark, "lake", "auth"))
        .getMessage should include("401")
      val authed = new IcebergRestCatalog.Client(stub.endpoint,
        oauth = Some(IcebergRestCatalog.OAuth("me", "secret")))
      IcebergInterop.read(spark,
        authed.loadTable(spark, "lake", "auth").localDir)
        .count() shouldBe 4L
      authed.loadTable(spark, "lake", "auth")
      // long-lived token: one fetch serves every request
      stub.tokenFetches.get() shouldBe 1L
    } finally stub.stop()
    // short-lived token: within the 30 s refresh margin, so every
    // request re-fetches — the refresh path exercised without sleeping
    val stub2 = new StubCatalog(requireAuth = true, tokenTtlSec = 1L)
    try {
      val t = fresh()
      IcebergInterop.write((1L to 4L).map(i => (i, i)).toDF("id", "v"), t)
      stub2.seed("lake", "auth2", t)
      val c = new IcebergRestCatalog.Client(stub2.endpoint,
        oauth = Some(IcebergRestCatalog.OAuth("me", "secret")))
      c.loadTable(spark, "lake", "auth2")
      c.loadTable(spark, "lake", "auth2")
      stub2.tokenFetches.get() should be >= 2L
    } finally stub2.stop()
  }

  test("namespace and table listings follow next-page-token to the " +
    "end") {
    import spark.implicits._
    val stub = new StubCatalog(pageSize = 1)
    try {
      val client = new IcebergRestCatalog.Client(stub.endpoint)
      Seq("a", "b", "c").foreach { n =>
        val t = fresh()
        IcebergInterop.write(Seq((1L, 1L)).toDF("id", "v"), t)
        stub.seed("lake", n, t)
      }
      client.listTables(spark, "lake") shouldBe Seq("a", "b", "c")
      client.listNamespaces(spark) shouldBe Seq("lake")
    } finally stub.stop()
  }

  test("a commit that evolves the PARTITION SPEC publishes add-spec " +
    "+ set-default-spec (-1 = last added) instead of dropping it; a " +
    "local expireSnapshots publishes remove-snapshots; a local tag " +
    "publishes set-snapshot-ref") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 10L).map(i => (i, i % 3))
        .toDF("id", "p"), t)
      IcebergInterop.upgradeFormat(spark, t)
      stub.seed("lake", "spec", t)
      // overwrite under a NEW identity spec on p
      val rt = client.loadTable(spark, "lake", "spec")
      IcebergInterop.write(
        (1L to 10L).map(i => (i, i % 3)).toDF("id", "p"),
        rt.localDir, overwrite = true,
        partitionBy = Seq(IcebergInterop.SpecField("p", "identity", "p")))
      client.commitTable(spark, "lake", "spec", rt)
      val meta = stub.tables.get("lake.spec")
      (meta \ "partition-specs") match {
        case JArray(xs) => xs.length shouldBe 2
        case other => fail(s"partition-specs: $other")
      }
      // -1 resolved by the server to the ADDED spec's id
      (meta \ "default-spec-id") match {
        case JInt(n) => n.toInt shouldBe 1
        case JLong(n) => n.toInt shouldBe 1
        case other => fail(s"default-spec-id: $other")
      }
      // the committed spec round-trips: a fresh load reads fine
      val rt2 = client.loadTable(spark, "lake", "spec")
      IcebergInterop.read(spark, rt2.localDir).count() shouldBe 10L
      // a TAG created locally publishes as set-snapshot-ref
      IcebergInterop.createRef(spark, rt2.localDir, "v1", "tag")
      client.commitTable(spark, "lake", "spec", rt2)
      val rt3 = client.loadTable(spark, "lake", "spec")
      IcebergInterop.refsTable(spark, rt3.localDir)
        .filter(col("name") === "v1").count() shouldBe 1L
      // grow history, then a local expiry publishes remove-snapshots
      client.appendWithRetry(spark, "lake", "spec",
        Seq((100L, 1L)).toDF("id", "p"))
      val rt4 = client.loadTable(spark, "lake", "spec")
      val before = (stub.tables.get("lake.spec") \ "snapshots") match {
        case JArray(xs) => xs.length
        case _ => 0
      }
      before shouldBe 3 // seed + overwrite + append
      IcebergInterop.expireSnapshots(spark, rt4.localDir, keepLast = 1)
      client.commitTable(spark, "lake", "spec", rt4)
      // the seed snapshot dropped; the tagged one is ref-kept
      (stub.tables.get("lake.spec") \ "snapshots") match {
        case JArray(xs) => xs.length shouldBe 2
        case other => fail(s"snapshots: $other")
      }
      IcebergInterop.read(spark,
        client.loadTable(spark, "lake", "spec").localDir)
        .count() shouldBe 11L
    }
  }

  test("a declared SORT ORDER commits as add-sort-order + " +
    "set-default-sort-order (-1 = last added, surviving server " +
    "renumbering) and round-trips; dangling/removed orders refuse") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
      stub.seed("lake", "sorted", t)
      val rt = client.loadTable(spark, "lake", "sorted")
      IcebergInterop.replaceSortOrder(spark, rt.localDir,
        Seq(IcebergInterop.IceSortField("id", asc = true,
          nullsFirst = true)))
      client.commitTable(spark, "lake", "sorted", rt)
      // the stub ASSIGNS its own order ids (renumbering allowed) —
      // the -1 pointer still lands on the declared order
      val back = client.loadTable(spark, "lake", "sorted")
      val st = IcebergInterop.state(spark, back.localDir, None)
      st.defaultSortOrderId should be > 0
      st.sortFields shouldBe Seq(IcebergInterop.IceSortField(
        "id", asc = true, nullsFirst = true))
      // an append through the catalog now lands SORTED and stamped
      client.appendWithRetry(spark, "lake", "sorted",
        Seq((9L, 9L), (7L, 7L)).toDF("id", "v"))
      val after = client.loadTable(spark, "lake", "sorted")
      val stA = IcebergInterop.state(spark, after.localDir, None)
      stA.files.filter(_.sortOrderId.isDefined) should not be empty
      IcebergInterop.read(spark, after.localDir).count() shouldBe 7L
      // DANGLING pointer refusal: hand-edit the head's default to an
      // order the metadata does not list
      val rt2 = client.loadTable(spark, "lake", "sorted")
      IcebergInterop.write(Seq((11L, 11L)).toDF("id", "v"), rt2.localDir)
      val metaDir = new Path(rt2.localDir, "metadata")
      val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
      val headV = fs.listStatus(metaDir).map(_.getPath.getName)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong).max
      val headP = new Path(metaDir, s"v$headV.metadata.json")
      val in = fs.open(headP)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString finally in.close()
      val out = fs.create(headP, true)
      try out.write(text.replaceAll(
        "\"default-sort-order-id\":\\d+",
        "\"default-sort-order-id\":99")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        client.commitTable(spark, "lake", "sorted", rt2))
        .getMessage should include("DANGLING")
      // REMOVAL refusal: a head that drops a base-listed order
      val rt3 = client.loadTable(spark, "lake", "sorted")
      IcebergInterop.write(Seq((13L, 13L)).toDF("id", "v"), rt3.localDir)
      val headV3 = fs.listStatus(new Path(rt3.localDir, "metadata"))
        .map(_.getPath.getName)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong).max
      val headP3 = new Path(new Path(rt3.localDir, "metadata"),
        s"v$headV3.metadata.json")
      val in3 = fs.open(headP3)
      val text3 = try scala.io.Source.fromInputStream(in3, "UTF-8")
        .mkString finally in3.close()
      def oid0(v: JValue): Long = v match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => -1L
      }
      val mj = JsonMethods.parse(text3).asInstanceOf[JObject]
      val pruned = JObject(mj.obj.map {
        case ("sort-orders", JArray(xs)) =>
          "sort-orders" -> (JArray(
            xs.filter(o => oid0(o \ "order-id") == 0L)): JValue)
        case ("default-sort-order-id", _) =>
          "default-sort-order-id" -> (JInt(0): JValue)
        case other => other
      })
      val out3 = fs.create(headP3, true)
      try out3.write(JsonMethods.compact(JsonMethods.render(pruned))
        .getBytes(StandardCharsets.UTF_8))
      finally out3.close()
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        client.commitTable(spark, "lake", "sorted", rt3))
        .getMessage should include("REMOVE sort order")
    }
  }

  test("the SQL read path reuses its staged mirror while the " +
    "catalog pointer is unchanged, and restages when it moves") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 6L).map(i => (i, i)).toDF("id", "v"), t)
      stub.seed("lake", "reuse", t)
      val a = client.loadTableReusing(spark, "lake", "reuse")
      val b = client.loadTableReusing(spark, "lake", "reuse")
      b.localDir shouldBe a.localDir // unchanged pointer → same mirror
      client.appendWithRetry(spark, "lake", "reuse",
        Seq((100L, 100L)).toDF("id", "v"))
      val c = client.loadTableReusing(spark, "lake", "reuse")
      c.localDir should not be a.localDir // moved pointer → restaged
      IcebergInterop.read(spark, c.localDir).count() shouldBe 7L
      // a mirror dirtied by a LOCAL commit is never reused
      IcebergInterop.write(Seq((200L, 200L)).toDF("id", "v"), c.localDir)
      val d = client.loadTableReusing(spark, "lake", "reuse")
      d.localDir should not be c.localDir
      IcebergInterop.read(spark, d.localDir).count() shouldBe 7L
    }
  }

  test("a v3 row-lineage commit refuses by name: the REST update " +
    "vocabulary cannot advance next-row-id, and publishing without " +
    "it would hand the next writer colliding row ids") {
    import spark.implicits._
    withCatalog { (stub, client) =>
      val t = fresh()
      IcebergInterop.write((1L to 5L).toDF("id"), t)
      IcebergInterop.upgradeFormat(spark, t)
      IcebergInterop.upgradeFormat(spark, t, 3)
      stub.seed("lake", "v3t", t)
      val rt = client.loadTable(spark, "lake", "v3t")
      IcebergInterop.read(spark, rt.localDir).count() shouldBe 5L // reads fine
      IcebergInterop.write(Seq(100L).toDF("id"), rt.localDir)
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        client.commitTable(spark, "lake", "v3t", rt))
        .getMessage should include("next-row-id")
      // nothing reached the catalog
      IcebergInterop.read(spark,
        client.loadTable(spark, "lake", "v3t").localDir)
        .count() shouldBe 5L
    }
  }
}
