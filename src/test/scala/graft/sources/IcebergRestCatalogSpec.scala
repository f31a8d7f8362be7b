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
  private final class StubCatalog {
    val tables =
      new java.util.concurrent.ConcurrentHashMap[String, JValue]()
    val commits = new java.util.concurrent.atomic.AtomicLong()
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
            set("current-schema-id", u \ "schema-id")
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
            set("current-snapshot-id", u \ "snapshot-id")
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
