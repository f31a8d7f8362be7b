package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import DeltaInterop.UnsupportedDeltaFeatureException

/** Delta COLUMN DEFAULT VALUES (PROTOCOL.md §Column Default Values,
  * the `allowColumnDefaults` writer feature): `ALTER COLUMN … SET
  * DEFAULT <expr>` records the expression's SQL text as the field's
  * `CURRENT_DEFAULT` metadata in one metadata-only commit, and from
  * then on ANY session's append that omits the column applies the
  * constant — explicit values win. The protocol's asymmetry with
  * Iceberg v3 is part of the surface: Delta has NO initial-default
  * (existing rows are untouched) and forbids ADD COLUMN with a
  * default outright. */
class DeltaColumnDefaultsSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  test("SET DEFAULT: metadata-only writer-feature commit; omitting " +
    "appends apply it, explicit wins, named-column INSERT fills, " +
    "DROP DEFAULT restores the missing-column refusal") {
    import spark.implicits._
    val t = fresh("graft-delta-defaults")
    DeltaInterop.write(
      (1 to 4).map(i => (i, s"s$i", i * 10)).toDF("id", "s", "v"), t)
    val before = DeltaInterop.state(spark, t, None)
    val filesBefore = before.files.map(_.path).toSet

    val ver = DeltaInterop.setColumnDefault(spark, t, "v", "42")
    ver shouldBe before.version + 1
    val st = DeltaInterop.state(spark, t, None)
    // metadata-only: no file moved; the spec's CURRENT_DEFAULT key
    st.files.map(_.path).toSet shouldBe filesBefore
    st.schema("v").metadata.getString("CURRENT_DEFAULT") shouldBe "42"
    // protocol: allowColumnDefaults is WRITER-ONLY — reader side as
    // recorded
    st.minWriterVersion shouldBe 7
    st.writerFeatures should contain("allowColumnDefaults")
    st.minReaderVersion shouldBe before.minReaderVersion
    st.readerFeatures shouldBe before.readerFeatures

    // an append omitting v applies the default; explicit values win
    DeltaInterop.write(Seq((5, "s5")).toDF("id", "s"), t)
    DeltaInterop.write(Seq((6, "s6", 99)).toDF("id", "s", "v"), t)
    val byId = DeltaInterop.read(spark, t)
      .select("id", "v").as[(Int, Int)].collect().toMap
    byId(5) shouldBe 42
    byId(6) shouldBe 99
    byId(1) shouldBe 10 // existing rows untouched: no initial-default

    // SQL doors: SET DEFAULT with an expression, named-column INSERT
    // filling the defaulted column AND null-filling a plain nullable
    // omitted column
    DeltaSql.register("defaults_t", t)
    spark.sql(
      "ALTER TABLE graft_delta.defaults_t ALTER COLUMN v SET DEFAULT 6 * 7")
    DeltaInterop.state(spark, t, None).schema("v").metadata
      .getString("CURRENT_DEFAULT") shouldBe "6 * 7"
    spark.sql("INSERT INTO graft_delta.defaults_t (id) VALUES (7)")
    val r7 = DeltaInterop.read(spark, t).filter(col("id") === 7)
      .select("v", "s").head()
    r7.getInt(0) shouldBe 42
    r7.isNullAt(1) shouldBe true

    // DROP DEFAULT: the metadata leaves, the feature stays declared,
    // and an omitting append refuses with the ordinary
    // missing-column error
    spark.sql("ALTER TABLE graft_delta.defaults_t ALTER COLUMN v DROP DEFAULT")
    val st2 = DeltaInterop.state(spark, t, None)
    st2.schema("v").metadata.contains("CURRENT_DEFAULT") shouldBe false
    st2.writerFeatures should contain("allowColumnDefaults")
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.write(Seq((8, "s8")).toDF("id", "s"), t)
    }
    e.getMessage should include("missing [v]")
    // drop on a column with no default no-ops (no new commit)
    DeltaInterop.dropColumnDefault(spark, t, "v") shouldBe st2.version
  }

  test("refusals by name: non-constant / non-deterministic / " +
    "runtime-error expressions, generated / identity / partition " +
    "columns, ADD COLUMN with DEFAULT, partial-list INSERT OVERWRITE, " +
    "omitted NOT NULL without default") {
    import spark.implicits._
    val t = fresh("graft-delta-defaults-ref")
    DeltaInterop.write((1 to 3).map(i => (i, s"p${i % 2}", i * 1.0))
      .toDF("id", "p", "x"), t, partitionBy = Seq("p"))

    // a column reference is not a constant
    val e1 = intercept[IllegalArgumentException] {
      DeltaInterop.setColumnDefault(spark, t, "x", "id + 1")
    }
    e1.getMessage should include("not a constant expression")
    // non-deterministic refuses
    val e2 = intercept[IllegalArgumentException] {
      DeltaInterop.setColumnDefault(spark, t, "x", "rand()")
    }
    e2.getMessage should include("non-deterministic")
    // a runtime error refuses at DECLARATION, not at a later insert
    intercept[Exception] {
      DeltaInterop.setColumnDefault(spark, t, "x", "1/0")
    }
    // partition column refuses
    val e3 = intercept[UnsupportedDeltaFeatureException] {
      DeltaInterop.setColumnDefault(spark, t, "p", "'p0'")
    }
    e3.getMessage should include("partition column")
    // unknown column refuses
    intercept[IllegalArgumentException] {
      DeltaInterop.setColumnDefault(spark, t, "nope", "1")
    }

    // identity columns allocate — a default would collide
    val ti = fresh("graft-delta-defaults-id")
    DeltaInterop.write(Seq((1L, "a")).toDF("k", "s"), ti,
      identity = Seq(DeltaInterop.IdentityColumn("k", 1L, 1L,
        allowExplicitInsert = true)))
    val e4 = intercept[UnsupportedDeltaFeatureException] {
      DeltaInterop.setColumnDefault(spark, ti, "k", "7")
    }
    e4.getMessage should include("IDENTITY")

    // generated columns derive — a default would shadow
    val tg = fresh("graft-delta-defaults-gen")
    val gm = new MetadataBuilder()
      .putString("delta.generationExpression", "id * 2").build()
    DeltaInterop.write(
      Seq((1, 2)).toDF("id", "twice")
        .select(col("id"), col("twice").as("twice", gm)), tg)
    val e5 = intercept[UnsupportedDeltaFeatureException] {
      DeltaInterop.setColumnDefault(spark, tg, "twice", "0")
    }
    e5.getMessage should include("GENERATED")

    // SQL: ADD COLUMNS with DEFAULT refuses by the protocol's rule
    DeltaSql.register("defaults_ref", t)
    val e6 = intercept[UnsupportedOperationException] {
      spark.sql(
        "ALTER TABLE graft_delta.defaults_ref ADD COLUMNS (y INT DEFAULT 5)")
    }
    e6.getMessage should include("forbids adding a column with a default")

    // INSERT OVERWRITE with a partial column list refuses; omitted
    // NOT NULL without a default refuses on append
    val e7 = intercept[UnsupportedOperationException] {
      spark.sql(
        "INSERT OVERWRITE graft_delta.defaults_ref (id, p) " +
          "VALUES (9, 'p1')")
    }
    e7.getMessage should include("overwrite replaces the table")
    val e8 = intercept[Exception] {
      spark.sql(
        "INSERT INTO graft_delta.defaults_ref (p, x) VALUES ('p1', 2.0)")
    }
    e8.getMessage should include("NOT NULL column 'id'")
  }
}
