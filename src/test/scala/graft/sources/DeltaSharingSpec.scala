package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Delta Sharing end-to-end: [[DeltaSharingServer]] (the provider
  * half, serving graft Delta tables over the protocol's REST + NDJSON
  * wire with presigned-style urls) round-tripped against
  * [[DeltaSharing.Client]] (the consumer half, reading through the
  * ranged-GET [[GraftShareFs]] scheme so the parquet scan stays
  * distributed). The wire is the delta-io/delta-sharing PROTOCOL.md
  * "parquet" response format. */
class DeltaSharingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  private def serve(tables: (String, String, String, String)*)
      : (DeltaSharingServer, DeltaSharing.Client) = {
    val server = new DeltaSharingServer(spark, "tok-secret")
    tables.foreach { case (sh, sc, n, p) => server.addTable(sh, sc, n, p) }
    server.start()
    val client = new DeltaSharing.Client(
      DeltaSharing.Profile.fromJson(server.profileJson))
    (server, client)
  }

  test("listings page, version/metadata/query round-trip a " +
    "partitioned table through ranged HTTP; bad token and unknown " +
    "routes refuse; SQL door serves read-only") {
    import spark.implicits._
    val t = fresh("graft-sharing")
    DeltaInterop.write(
      (1 to 40).map(i => (i, s"p${i % 3}", i * 1.5))
        .toDF("id", "p", "x"), t, partitionBy = Seq("p"))
    val t2 = fresh("graft-sharing2")
    DeltaInterop.write(Seq((1, "a")).toDF("k", "v"), t2)
    val (server, client) = serve(
      ("sales", "retail", "orders", t),
      ("sales", "retail", "aux", t2),
      ("ops", "logs", "events", t2))
    try {
      client.listShares() shouldBe Seq("sales", "ops")
      client.listSchemas("sales") shouldBe Seq("retail")
      client.listTables("sales", "retail") shouldBe Seq("orders", "aux")
      // pagination: maxResults=1 forces the nextPageToken walk
      client.listTables("sales", "retail",
        maxResults = Some(1)) shouldBe Seq("orders", "aux")
      client.listShares(maxResults = Some(1)) shouldBe Seq("sales", "ops")

      client.tableVersion("sales", "retail", "orders") shouldBe 0L
      val meta = client.tableMetadata("sales", "retail", "orders")
      meta.partitionColumns shouldBe Seq("p")
      meta.schema.fieldNames.toSeq shouldBe Seq("id", "p", "x")

      val df = client.queryTable(spark, "sales", "retail", "orders")
      df.count() shouldBe 40L
      // partition columns re-attach per tuple
      df.filter(col("p") === "p1").count() shouldBe 14L
      df.agg(org.apache.spark.sql.functions.sum("id"))
        .head().getLong(0) shouldBe 820L
      // the scan really went over the graftshare scheme (ranged
      // HTTP), not a local path
      df.inputFiles.foreach(f => f should startWith("graftshare://"))

      // SQL door: registered alias serves; writes refuse by name
      DeltaSharing.register("shared_orders", client,
        "sales", "retail", "orders")
      spark.sql("SELECT count(*) AS n FROM " +
        "graft_delta_sharing.shared_orders WHERE p = 'p0'")
        .head().getLong(0) shouldBe 13L
      val e = intercept[UnsupportedOperationException] {
        spark.sql("INSERT INTO graft_delta_sharing.shared_orders " +
          "VALUES (99, 'p9', 0.0)")
      }
      e.getMessage should include("READ-ONLY")

      // wrong bearer refuses with the named 401
      val bad = new DeltaSharing.Client(DeltaSharing.Profile.fromJson(
        s"""{"shareCredentialsVersion":1,"endpoint":"${
          server.endpoint}","bearerToken":"wrong"}"""))
      val e2 = intercept[IllegalArgumentException](bad.listShares())
      e2.getMessage should include("rejected the bearer token")
      // unknown table refuses
      intercept[IllegalArgumentException] {
        client.tableVersion("sales", "retail", "nope")
      }
    } finally server.stop()
  }

  test("VERSION AS OF pins a snapshot; DV / column-mapped tables " +
    "refuse by name; profile version and expiry refuse") {
    import spark.implicits._
    val t = fresh("graft-sharing-tt")
    DeltaInterop.write((1 to 10).map(i => (i, s"s$i")).toDF("id", "s"), t)
    DeltaInterop.write((11 to 15).map(i => (i, s"s$i")).toDF("id", "s"), t)
    val (server, client) = serve(("sh", "sc", "t", t))
    try {
      client.tableVersion("sh", "sc", "t") shouldBe 1L
      client.queryTable(spark, "sh", "sc", "t").count() shouldBe 15L
      client.queryTable(spark, "sh", "sc", "t", version = Some(0L))
        .count() shouldBe 10L
      DeltaSharing.register("tt", client, "sh", "sc", "t")
      spark.sql(
        "SELECT count(*) AS n FROM graft_delta_sharing.tt VERSION AS OF 0")
        .head().getLong(0) shouldBe 10L

      // a live deletion vector cannot ride the parquet response
      DeltaInterop.delete(spark, t, col("id") === 3)
      val e = intercept[IllegalArgumentException] {
        client.queryTable(spark, "sh", "sc", "t")
      }
      e.getMessage should include("DELETION VECTORS")
      // but the pre-DV version still serves
      client.queryTable(spark, "sh", "sc", "t", version = Some(1L))
        .count() shouldBe 15L
    } finally server.stop()

    // column-mapped tables refuse by name
    val tm = fresh("graft-sharing-cm")
    DeltaInterop.write(Seq((1, "a")).toDF("id", "s"), tm,
      columnMapping = "name")
    val (server2, client2) = serve(("sh", "sc", "m", tm))
    try {
      val e = intercept[IllegalArgumentException] {
        client2.queryTable(spark, "sh", "sc", "m")
      }
      e.getMessage should include("column mapping")
    } finally server2.stop()

    // profile refusals by name
    intercept[IllegalArgumentException] {
      DeltaSharing.Profile.fromJson(
        """{"shareCredentialsVersion":2,"endpoint":"x","bearerToken":"y"}""")
    }.getMessage should include("shareCredentialsVersion 2 is not supported")
    val expired = new DeltaSharing.Client(DeltaSharing.Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"http://127.0.0.1:1",""" +
        """"bearerToken":"y","expirationTime":"2000-01-01T00:00:00Z"}"""))
    intercept[IllegalArgumentException](expired.listShares())
      .getMessage should include("expired")
  }

  test("changes: cdf actions supersede file-level derivation, adds " +
    "read as inserts, removes as deletes; matches the local " +
    "changeFeed; CDF-off file-level ranges refuse") {
    import spark.implicits._
    val t = fresh("graft-sharing-cdf")
    DeltaInterop.write((1 to 8).map(i => (i, i * 10)).toDF("id", "v"), t,
      overwrite = false)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.write(Seq((9, 90), (10, 100)).toDF("id", "v"), t)
    DeltaInterop.update(spark, t, col("id") === 9,
      Seq("v" -> org.apache.spark.sql.functions.lit(99)))
    val (server, client) = serve(("sh", "sc", "t", t))
    try {
      val local = DeltaInterop.changeFeed(spark, t, 2, 3)
        .select("id", "v", "_change_type", "_commit_version")
        .as[(Int, Int, String, Long)].collect().toSet
      val shared = client.tableChanges(spark, "sh", "sc", "t", 2L, Some(3L))
        .select("id", "v", "_change_type", "_commit_version")
        .as[(Int, Int, String, Long)].collect().toSet
      shared shouldBe local
      shared.map(_._3) should contain allOf
        ("insert", "update_preimage", "update_postimage")
      // a range reaching back before CDF enablement refuses (the
      // same refusal the local feed raises)
      val e = intercept[IllegalArgumentException] {
        client.tableChanges(spark, "sh", "sc", "t", 0L, Some(3L))
      }
      e.getMessage should include("change data feed is not enabled")
    } finally server.stop()
  }
}
