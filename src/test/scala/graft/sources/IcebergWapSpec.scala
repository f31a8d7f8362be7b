package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** WRITE-AUDIT-PUBLISH on the Iceberg interop: branch writes
  * (`write(branch=…)` / the session's `spark.wap.branch`) land on
  * their ref while `main`, the current pointer and the snapshot-log
  * stay pinned; audit reads serve the branch; [[IcebergInterop
  * .fastForward]] publishes a branch head after PROVING descent by
  * the recorded `parent-snapshot-id` chain; divergence, tags and
  * in-session DML refuse by name. */
class IcebergWapSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-wap")
      .toString + "/t"

  private def withWap[A](branch: String)(body: => A): A = {
    spark.conf.set("spark.wap.branch", branch)
    try body finally spark.conf.unset("spark.wap.branch")
  }

  test("branch writes stack on the ref; main and the snapshot-log " +
    "stay pinned; audit reads serve the branch; fastForward " +
    "publishes and the log gains exactly the published head") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val mainCount = 2L
    val logBefore = IcebergInterop.snapshotLineage(spark, t).length
    // two stacked branch writes — the first forks from the head
    withWap("audit") {
      IcebergInterop.write(Seq((10L, "x")).toDF("id", "v"), t)
      IcebergInterop.write(Seq((11L, "y")).toDF("id", "v"), t)
      // the WAP session reads its own branch
      IcebergInterop.read(spark, t).count() shouldBe 4L
    }
    // outside the session: main untouched, log unmoved, ref declared
    IcebergInterop.read(spark, t).count() shouldBe mainCount
    IcebergInterop.snapshotLineage(spark, t).length shouldBe logBefore
    val (branchHead, kind) = IcebergInterop.refs(spark, t)("audit")
    kind shouldBe "branch"
    // explicit branch read serves the stacked rows
    IcebergInterop.readRef(spark, t, "audit").count() shouldBe 4L
    // publish: current moves to the branch head, log gains ONE entry
    IcebergInterop.fastForward(spark, t, "audit") shouldBe branchHead
    IcebergInterop.read(spark, t).count() shouldBe 4L
    IcebergInterop.snapshotLineage(spark, t).length shouldBe
      (logBefore + 1)
    // re-publish of an already-current branch no-ops
    IcebergInterop.fastForward(spark, t, "audit") shouldBe branchHead
  }

  test("divergence refuses: a main write after the fork makes the " +
    "branch head non-descending; DML/overwrite inside the wap " +
    "session refuse by name; tags cannot take writes") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq((1L, "a")).toDF("id", "v"), t)
    withWap("audit") {
      IcebergInterop.write(Seq((2L, "b")).toDF("id", "v"), t)
      // DML inside the audit session would silently hit MAIN
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        IcebergInterop.delete(spark, t, col("id") === 1L))
        .getMessage should include("wap")
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        IcebergInterop.optimize(spark, t))
        .getMessage should include("wap")
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        IcebergInterop.write(Seq((3L, "c")).toDF("id", "v"), t,
          overwrite = true)).getMessage should include("branch")
    }
    // main moves past the fork point → descent unprovable → refuse
    IcebergInterop.write(Seq((9L, "z")).toDF("id", "v"), t)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.fastForward(spark, t, "audit"))
      .getMessage should (include("descend") or include("unprovable"))
    // a tag is not writable
    IcebergInterop.createRef(spark, t, "pinned", "tag")
    withWap("pinned") {
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        IcebergInterop.write(Seq((4L, "d")).toDF("id", "v"), t))
        .getMessage should include("tag")
    }
    // fast-forwarding a tag refuses too
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.fastForward(spark, t, "pinned"))
      .getMessage should include("tag")
  }

  test("SQL doors: CREATE BRANCH / INSERT under spark.wap.branch / " +
    "FAST FORWARD TO / DROP BRANCH; v3 row ids never collide " +
    "across branch and main writes") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq((1L, "a")).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergSql.register("wap_t", t)
    spark.sql("ALTER TABLE graft_iceberg.wap_t CREATE BRANCH audit")
      .collect()
    IcebergInterop.refs(spark, t)("audit")._2 shouldBe "branch"
    withWap("audit") {
      spark.sql(
        "INSERT INTO graft_iceberg.wap_t VALUES (CAST(20 AS BIGINT), 'w')").collect()
      spark.sql("SELECT count(*) FROM graft_iceberg.wap_t")
        .head().getLong(0) shouldBe 2L
    }
    spark.sql("SELECT count(*) FROM graft_iceberg.wap_t")
      .head().getLong(0) shouldBe 1L
    // a MAIN write after the branch write takes FRESH row ids — the
    // branch commit advanced next-row-id in the same metadata, so
    // main and branch rows can never collide
    IcebergInterop.write(Seq((30L, "m")).toDF("id", "v"), t)
    // (the v1-era seed row carries NO lineage — nulls filtered)
    val mainIds = IcebergInterop.readRowLineage(spark, t)
      .filter("_row_id IS NOT NULL")
      .select("_row_id").as[Long].collect().toSet
    val branchIds = IcebergInterop
      .readRowLineage(spark, t,
        Some(IcebergInterop.resolveRef(spark, t, "audit")))
      .filter("_row_id IS NOT NULL")
      .select("_row_id").as[Long].collect().toSet
    mainIds should not be empty
    branchIds should not be empty
    (mainIds intersect branchIds) shouldBe Set.empty
    // main moved past the fork → the SQL publish refuses
    intercept[Exception](spark.sql(
      "ALTER TABLE graft_iceberg.wap_t FAST FORWARD TO audit").collect())
    // a clean second cycle: fork a NEW branch from the moved head,
    // write, publish through SQL, then drop the branch
    spark.sql("ALTER TABLE graft_iceberg.wap_t CREATE BRANCH audit2")
      .collect()
    withWap("audit2") {
      spark.sql(
        "INSERT INTO graft_iceberg.wap_t VALUES (CAST(40 AS BIGINT), 'q')").collect()
    }
    spark.sql("ALTER TABLE graft_iceberg.wap_t FAST FORWARD TO audit2")
      .collect()
    spark.sql("SELECT count(*) FROM graft_iceberg.wap_t")
      .head().getLong(0) shouldBe 3L // seed + main write + published
    spark.sql("ALTER TABLE graft_iceberg.wap_t DROP BRANCH audit2")
      .collect()
    IcebergInterop.refs(spark, t).get("audit2") shouldBe None
  }
}
