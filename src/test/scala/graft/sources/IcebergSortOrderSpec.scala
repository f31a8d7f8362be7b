package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import IcebergInterop.IceSortField

/** Iceberg table SORT ORDERS (spec §Sorting), end to end:
  * [[IcebergInterop.replaceSortOrder]] declares the default order,
  * appends range-distribute + sort by it and stamp `sort_order_id`
  * on the staged manifest entries, OPTIMIZE re-sorts unstamped
  * files, and — the carry fix — a commit to a table that already
  * declares sort orders carries them VERBATIM instead of resetting
  * to order 0 (which would leave a foreign reader's
  * `default-sort-order-id` dangling). */
class IcebergSortOrderSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-sort")
      .toString + "/t"

  private def metaJson(t: String): JValue = {
    val dir = new java.io.File(t, "metadata")
    val v = dir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong).max
    JsonMethods.parse(scala.io.Source.fromFile(
      new java.io.File(dir, s"v$v.metadata.json")).mkString)
  }

  private def jnum(v: JValue): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case _ => -1L
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("declare → append: files sorted, stamped, ranges disjoint; " +
    "metadata records the order; read-back exact") {
    import spark.implicits._
    val t = fresh()
    // seed unsorted, THEN declare — the declaration is metadata-only
    IcebergInterop.write(
      Seq((7L, "g"), (3L, "c"), (9L, "i")).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t, 2)
    val oid = IcebergInterop.replaceSortOrder(spark, t,
      Seq(IceSortField("id", asc = true, nullsFirst = true)))
    oid shouldBe 1
    val st0 = IcebergInterop.state(spark, t, None)
    st0.defaultSortOrderId shouldBe 1
    st0.sortFields shouldBe Seq(
      IceSortField("id", asc = true, nullsFirst = true))
    // an append of SHUFFLED keys lands range-distributed and sorted;
    // pin >1 file by pinning the range shuffle's partition count
    val before = st0.files.map(_.path).toSet
    withConf(
      "spark.sql.shuffle.partitions" -> "3",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      IcebergInterop.write(
        new scala.util.Random(7).shuffle((100L to 199L).toList)
          .map(i => (i, s"r$i")).toDF("id", "v"), t)
    }
    val st1 = IcebergInterop.state(spark, t, None)
    val added = st1.files.filterNot(f => before(f.path))
    added.size should be > 1
    // every added entry stamped with the declared order
    added.foreach(_.sortOrderId shouldBe Some(1))
    // per-file recorded ranges pairwise disjoint (range distribution)
    val ranges = added.map(f =>
      (f.lower("id").left.get, f.upper("id").left.get)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => hi should be < lo
      case _ =>
    }
    // one file's rows are monotonically ascending (within-file sort)
    val probe = spark.read.parquet(added.head.path)
      .select("id").as[Long].collect()
    probe.toSeq shouldBe probe.sorted.toSeq
    // the seed file (pre-declaration) is NOT stamped
    st1.files.filter(f => before(f.path))
      .foreach(_.sortOrderId shouldBe None)
    // metadata: order recorded once, default points at it, and the
    // append CARRIED it (no reset to order 0)
    val m = metaJson(t)
    jnum(m \ "default-sort-order-id") shouldBe 1
    (m \ "sort-orders") match {
      case JArray(orders) =>
        orders.map(o => jnum(o \ "order-id")).toSet should
          contain(1L)
      case other => fail(s"sort-orders: $other")
    }
    IcebergInterop.read(spark, t).count() shouldBe 103L
  }

  test("desc + nulls-last honored; WRITE UNORDERED returns to order " +
    "0; identical re-declaration reuses the order id") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      Seq((Option(1L), "a")).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t, 2)
    IcebergInterop.replaceSortOrder(spark, t,
      Seq(IceSortField("id", asc = false, nullsFirst = false))) shouldBe 1
    IcebergInterop.write(
      Seq((Option(5L), "e"), (Option(2L), "b"),
        (Option.empty[Long], "n"), (Option(9L), "i"))
        .toDF("id", "v"), t)
    val st = IcebergInterop.state(spark, t, None)
    val stamped = st.files.filter(_.sortOrderId.contains(1))
    stamped should not be empty
    // descending with nulls last inside the staged file(s)
    val rows = spark.read.parquet(stamped.map(_.path): _*)
      .select("id").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // reading one file: non-null values descend, nulls at the tail
    if (stamped.size == 1) {
      val (nonNull, nulls) = rows.toSeq.span(_.isDefined)
      nulls.foreach(_ shouldBe None)
      val vs = nonNull.flatten
      vs shouldBe vs.sortBy(-_)
    }
    // unsorted again: pointer back to 0, later appends unstamped
    IcebergInterop.replaceSortOrder(spark, t, Nil) shouldBe 0
    val before = IcebergInterop.state(spark, t, None).files.map(_.path).toSet
    IcebergInterop.write(Seq((4L, "d")).toDF("id", "v"), t)
    IcebergInterop.state(spark, t, None).files
      .filterNot(f => before(f.path))
      .foreach(_.sortOrderId shouldBe None)
    // the order list survives the round trip; re-declaring the same
    // fields reuses id 1 instead of minting a new order
    IcebergInterop.replaceSortOrder(spark, t,
      Seq(IceSortField("id", asc = false, nullsFirst = false))) shouldBe 1
  }

  test("declare-then-OPTIMIZE re-sorts the unstamped files once and " +
    "converges; foreign transform orders carry verbatim, unhonored") {
    import spark.implicits._
    val t = fresh()
    (0 until 2).foreach(k => IcebergInterop.write(
      (1L to 100L).filter(_ % 2 == k.toLong).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1), t))
    IcebergInterop.upgradeFormat(spark, t, 2)
    IcebergInterop.replaceSortOrder(spark, t,
      Seq(IceSortField("id", asc = true, nullsFirst = true)))
    val total = IcebergInterop.state(spark, t, None).files.map(_.bytes).sum
    IcebergInterop.optimize(spark, t, targetFileBytes = total / 2 + 1)
    val st = IcebergInterop.state(spark, t, None)
    st.files.foreach(_.sortOrderId shouldBe Some(1))
    val ranges = st.files.map(f =>
      (f.lower("id").left.get, f.upper("id").left.get)).sortBy(_._1)
    ranges.size should be > 1
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => hi should be < lo
      case _ =>
    }
    IcebergInterop.read(spark, t).count() shouldBe 100L
    // converged: everything stamped, nothing under this target →
    // no commit
    val snap = st.snapshotId
    IcebergInterop.optimize(spark, t, targetFileBytes = 1L) shouldBe snap
    // FOREIGN transform order: inject a bucket-transform order as a
    // foreign writer would; appends carry it verbatim but never
    // stamp (this writer does not pretend bucketed order)
    val dir = new java.io.File(t, "metadata")
    val vmax = dir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong).max
    val mj = metaJson(t).asInstanceOf[JObject]
    val idField = (mj \ "schemas") match {
      case JArray(xs) => (xs.head \ "fields") match {
        case JArray(fs0) => jnum(fs0.head \ "id")
        case _ => 1L
      }
      case _ => 1L
    }
    val foreignOrder: JValue = JObject(List(
      "order-id" -> JInt(7),
      "fields" -> JArray(List(JObject(List(
        "transform" -> JString("bucket[4]"),
        "source-id" -> JInt(idField),
        "direction" -> JString("asc"),
        "null-order" -> JString("nulls-first")))))))
    val edited = JObject(mj.obj.map {
      case ("sort-orders", JArray(xs)) =>
        "sort-orders" -> (JArray(xs :+ foreignOrder): JValue)
      case ("default-sort-order-id", _) =>
        "default-sort-order-id" -> (JInt(7): JValue)
      case other => other
    })
    val next = new java.io.File(dir, s"v${vmax + 1}.metadata.json")
    val w = new java.io.FileWriter(next)
    try w.write(JsonMethods.compact(JsonMethods.render(edited)))
    finally w.close()
    val hint = new java.io.FileWriter(new java.io.File(dir, "version-hint.text"))
    try hint.write((vmax + 1).toString) finally hint.close()
    val stF = IcebergInterop.state(spark, t, None)
    stF.defaultSortOrderId shouldBe 7
    stF.sortFields.map(_.transform) shouldBe Seq("bucket[4]")
    val before = stF.files.map(_.path).toSet
    IcebergInterop.write(Seq((500L, "x")).toDF("id", "v"), t)
    val after = metaJson(t)
    jnum(after \ "default-sort-order-id") shouldBe 7
    (after \ "sort-orders") match {
      case JArray(orders) =>
        orders.map(o => jnum(o \ "order-id")).toSet shouldBe
          Set(0L, 1L, 7L)
      case other => fail(s"sort-orders after append: $other")
    }
    IcebergInterop.state(spark, t, None).files
      .filterNot(f => before(f.path))
      .foreach(_.sortOrderId shouldBe None)
  }

  test("refusals: unknown column, transform declaration, repeated " +
    "column; SQL door WRITE ORDERED BY / WRITE UNORDERED") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq((1L, "a"), (9L, "z"), (4L, "m"))
      .toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t, 2)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.replaceSortOrder(spark, t,
        Seq(IceSortField("nope", asc = true, nullsFirst = true)))
    }.getMessage should include("nope")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.replaceSortOrder(spark, t,
        Seq(IceSortField("id", asc = true, nullsFirst = true,
          transform = "bucket[4]")))
    }.getMessage should include("bucket[4]")
    an[IllegalArgumentException] should be thrownBy
      IcebergInterop.replaceSortOrder(spark, t, Seq(
        IceSortField("id", asc = true, nullsFirst = true),
        IceSortField("id", asc = false, nullsFirst = false)))
    // the SQL door
    IcebergSql.register("sorted_t", t)
    spark.sql("ALTER TABLE graft_iceberg.sorted_t WRITE ORDERED BY " +
      "(id DESC NULLS LAST)").collect().head.getInt(0) shouldBe 1
    IcebergInterop.state(spark, t, None).sortFields shouldBe Seq(
      IceSortField("id", asc = false, nullsFirst = false))
    spark.sql("ALTER TABLE graft_iceberg.sorted_t WRITE UNORDERED")
      .collect().head.getInt(0) shouldBe 0
    IcebergInterop.state(spark, t, None).defaultSortOrderId shouldBe 0
  }
}
