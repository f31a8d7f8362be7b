package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table: binary payload with typed metadata") {
    val media = Multimodal.syntheticMediaTable(Tables.documents(spark, sf))
    media.schema("content").dataType.typeName shouldBe "binary"
    media.count() shouldBe Tables.documents(spark, sf).count()
    media.select(countDistinct(col("format"))).collect()
      .head.getLong(0) shouldBe 3
  }

  test("stub codec: deterministic, L1-normalized, fixed dimension") {
    val f1 = Multimodal.StubCodec.decode("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.StubCodec.decode("hello world".getBytes("UTF-8"))
    f1.toSeq shouldBe f2.toSeq
    f1.length shouldBe Multimodal.StubCodec.FeatureDim
    f1.sum shouldBe 1.0f +- 1e-5f
    Multimodal.StubCodec.decode(Array.emptyByteArray).sum shouldBe 0.0f
  }

  test("batched extraction preserves ids and emits fixed-width features") {
    import spark.implicits._
    val media = Multimodal.syntheticMediaTable(Tables.documents(spark, sf))
      .as[Multimodal.MediaRecord]
    val features = Multimodal.extractFeatures(media, batchSize = 7)
    val rows = features.collect()
    rows.map(_.media_id).sorted shouldBe
      Tables.documents(spark, sf).select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
    all(rows.map(_.features.length)) shouldBe Multimodal.StubCodec.FeatureDim
    // byte_len matches the payload (UTF-8 text) length
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select(col("text")).collect().head.getString(0)
    rows.find(_.media_id == 0L).get.byte_len shouldBe
      doc0.getBytes("UTF-8").length
  }

  test("frame-sample stub keeps every nth byte deterministically") {
    val bytes = (0 until 10).map(_.toByte).toArray
    Multimodal.StubCodec.sampleBytes(bytes, 3).toSeq shouldBe
      Seq[Byte](0, 3, 6, 9)
  }

  test("sampleMedia decimates payload bytes and halves dimensions") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "abcdefgh".getBytes("UTF-8"),
        "png", 640, 360)).toDS()
    val out = Multimodal.sampleMedia(media, everyNth = 3).collect().head
    new String(out.content, "UTF-8") shouldBe "adg"
    out.width shouldBe 320
    out.height shouldBe 180
    out.format shouldBe "png"
    out.media_id shouldBe 1L
  }
}
