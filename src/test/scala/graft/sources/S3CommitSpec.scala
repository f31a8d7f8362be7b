package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Drives [[S3Commit]]'s conditional-put primitive against a local stub
  * object store at the HTTP level (the EsSinkSpec pattern): `PUT` with
  * `If-None-Match: *`, 412 = lost the race. Data files go through an
  * `s3a://`-schemed FileSystem double; only the manifest publish rides
  * the conditional put — the production S3 posture end-to-end. */
class S3CommitSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Minimal S3-ish store: objects are files under `root`; a PUT with
    * `If-None-Match: *` atomically creates-or-412s. Serialization comes
    * from `Files.createFile` atomicity, not handler locking — two
    * in-flight conditional PUTs genuinely race on the filesystem
    * primitive, as they would on S3's internal CAS. */
  private final class StubS3(root: String) {
    val conditionalPuts = new java.util.concurrent.atomic.AtomicLong()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange: com.sun.net.httpserver.HttpExchange =>
      val key = exchange.getRequestURI.getPath.stripPrefix("/")
      val body = exchange.getRequestBody.readAllBytes()
      val target = Paths.get(root, key)
      val status =
        if (exchange.getRequestMethod != "PUT") 405
        else if ("*" == exchange.getRequestHeaders
            .getFirst("If-None-Match")) {
          conditionalPuts.incrementAndGet()
          Files.createDirectories(target.getParent)
          try {
            Files.write(Files.createFile(target), body)
            200
          } catch { case _: java.nio.file.FileAlreadyExistsException => 412 }
        } else { // unconditional PUT: last write wins (plain S3 PUT)
          Files.createDirectories(target.getParent)
          Files.write(target, body)
          200
        }
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def withStubStore(test: (StubS3, String) => Unit): Unit = {
    val root = Files.createTempDirectory("graft-s3stub").toString
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[ObjectStoreStubFileSystem].getName)
    conf.set("fs.graftstub.root", root)
    conf.set("fs.s3a.impl.disable.cache", "true")
    val stub = new StubS3(root)
    val prev = ManifestLake.installCommitPrimitive(
      S3Commit.httpConditionalPut(stub.endpoint))
    try test(stub, root)
    finally {
      ManifestLake.installCommitPrimitive(prev)
      stub.stop()
      // the session (and its hadoop conf) is suite-shared: leaving the
      // stub s3a mapping behind would make OTHER suites' s3a probes
      // resolve to this test's backing dir instead of failing cleanly
      conf.unset("fs.s3a.impl")
      conf.unset("fs.graftstub.root")
      conf.unset("fs.s3a.impl.disable.cache")
    }
  }

  private def rows(n: Range) = {
    import spark.implicits._
    n.map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
  }

  test("an s3a table commits through the HTTP conditional put and reads " +
    "back, time travel included") {
    withStubStore { (stub, _) =>
      val t = "s3a://testbucket/lake/t"
      ManifestLake.write(rows(1 to 100), t) shouldBe 1L
      ManifestLake.write(rows(101 to 150), t) shouldBe 2L
      stub.conditionalPuts.get() shouldBe 2L // every manifest publish
      ManifestLake.read(spark, t).count() shouldBe 150
      ManifestLake.read(spark, t, Some(1L)).count() shouldBe 100
      ManifestLake.read(spark, t).agg(
        org.apache.spark.sql.functions.sum("id")).collect()
        .head.getLong(0) shouldBe (1L to 150L).sum
    }
  }

  test("racing committers: exactly one conditional PUT wins a version") {
    withStubStore { (stub, _) =>
      val t = "s3a://testbucket/lake/race"
      ManifestLake.write(rows(1 to 10), t)
      // the primitive itself, raced: both publishes aim at version 2
      val fs = new Path(t).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val target = new Path(t + "/_manifests/v00000002.manifest")
      def stage(tag: String): Path = {
        val tmp = new Path(t + s"/_manifests/.tmp-race-$tag")
        val out = fs.create(tmp, false)
        try out.write(s"#racer=$tag\n".getBytes("UTF-8")) finally out.close()
        tmp
      }
      val prim = S3Commit.httpConditionalPut(stub.endpoint)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val results = Seq("a", "b").map { tag =>
        val tmp = stage(tag)
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = { gate.await(); prim.publish(fs, tmp, target) }
        })
      }
      gate.countDown()
      val won = results.map(_.get())
      pool.shutdown()
      won.count(identity) shouldBe 1 // exactly one 200, one 412
      // and at the lake level a sequential loser surfaces as lost-race
      the[IllegalStateException] thrownBy {
        val tmp = stage("c")
        if (!prim.publish(fs, tmp, target))
          throw new IllegalStateException("concurrent commit lost race")
      } should have message "concurrent commit lost race"
    }
  }

  test("without a conditional-put primitive, s3a commits are rejected " +
    "up front") {
    // default primitive active: scheme gate fires before any IO
    val err = intercept[IllegalArgumentException] {
      ManifestLake.write(rows(1 to 5), "s3a://testbucket/lake/rejected")
    }
    err.getMessage should include("no atomic publish-if-absent")
  }
}
