package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata, and
  * heavy per-item decode/feature work runs batched per partition.
  *
  * The actual media decode is STUBBED (this container ships no image/
  * audio codecs): [[StubCodec]] is a deterministic fake that stands in
  * for a JNI/FFI decoder. Everything around it — the schema contract,
  * the partition-batched execution shape, the feature-column layout —
  * is the real production plumbing and is tested as such.
  *
  * Scale notes: payload bytes never pass through a shuffle here — the
  * media table is processed scan→mapPartitions→project. Batch size
  * bounds per-task peak memory exactly like an Arrow batch would in a
  * `mapInPandas` pipeline.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, content: Array[Byte],
                               format: String, width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, byte_len: Int,
                                 features: Array[Float])

  /** ======== STUB ========
    * Deterministic fake decoder: a 16-bin byte histogram, L1-normalized,
    * standing in for "decode image → resize → embed". A real deployment
    * swaps `decode` for the codec call; the signature (bytes in, fixed-
    * width float features out) and everything downstream stay unchanged.
    */
  object StubCodec {
    val FeatureDim = 16

    def decode(content: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xFF) % FeatureDim) += 1f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      hist.map(_ / n)
    }

    /** STUB for frame sampling / resize: deterministic byte slicing. */
    def sampleBytes(content: Array[Byte], everyNth: Int): Array[Byte] =
      content.zipWithIndex.collect { case (b, i) if i % everyNth == 0 => b }
  }

  /** Synthesize a media table from `documents` (UTF-8 payload bytes +
    * derived metadata) — the driver corpus has no binary column, so the
    * plumbing is exercised on deterministic fake payloads. */
  def syntheticMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(pmod(col("doc_id"), lit(3)) === 0, "png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
        .otherwise("wav").as("format"),
      (pmod(col("doc_id"), lit(4)) * 160 + lit(320)).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 90 + lit(180)).cast("int").as("height"))

  /** Frame-sample + resize stage (STUB codec): keeps every `everyNth`
    * payload byte (standing in for frame decimation) and halves the
    * declared dimensions (standing in for a resampler). The shape is the
    * production contract — a narrow mapPartitions pass, binary payloads
    * never shuffled, metadata transformed alongside the bytes; swapping
    * [[StubCodec.sampleBytes]] for a real codec changes nothing
    * downstream. */
  def sampleMedia(media: Dataset[MediaRecord],
                  everyNth: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(content = StubCodec.sampleBytes(r.content, everyNth),
        width = r.width / 2, height = r.height / 2)))
  }

  /** Partition-batched feature extraction — the Scala analog of an Arrow
    * `mapInPandas` stage: each task walks its partition in bounded
    * batches, calls the (stub) codec per item, and emits the typed
    * feature rows. No shuffle; peak memory = batchSize payloads. */
  def extractFeatures(media: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.media_id, r.content.length,
            StubCodec.decode(r.content))
        }
      }
    }
  }
}

object MultimodalQueries {

  /** mm1 — binary-column metadata contract: payload length + content
    * hash + typed metadata, fully oracle-checkable (the payload IS the
    * UTF-8 text, so DuckDB re-derives everything). */
  def mm1MediaMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.syntheticMediaTable(graft.core.Tables.documents(s, d))
      .select(col("media_id"), length(col("content")).as("byte_len"),
        sha2(col("content"), 256).as("content_hash"),
        col("format"), col("width"), col("height"))

  val mm1Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
      |  sha256(text) AS content_hash,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  CAST(doc_id % 4 * 160 + 320 AS INTEGER) AS width,
      |  CAST(doc_id % 4 * 90 + 180 AS INTEGER) AS height
      |FROM documents""".stripMargin

  /** mm2 — the batched decode stage (stub codec → 16-dim features),
    * HASH-EXACT against the oracle: the stub's features are an
    * L1-normalized byte histogram, so multiplying each feature back by
    * the payload length and rounding recovers the integer bin counts
    * exactly (counts ≪ 2^23, so the float32 division round-trips), and
    * DuckDB re-derives those counts from `hex(blob)` byte pairs. The
    * gate output therefore flows THROUGH the decoded features — a wrong
    * decode breaks the hash — while every emitted column is
    * oracle-derivable scalars (the raw float vector itself stays pinned
    * value-exact in MultimodalSpec; nested columns crash the driver's
    * pandas compare). */
  def mm2MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.syntheticMediaTable(
      graft.core.Tables.documents(s, d)).as[Multimodal.MediaRecord]
    Multimodal.extractFeatures(media).toDF()
      .select($"media_id", $"byte_len",
        org.apache.spark.sql.functions.size($"features").as("feature_dim"),
        concat_ws(",", transform($"features",
          f => round(f * greatest($"byte_len", lit(1)))
            .cast("int").cast("string"))).as("hist_csv"))
  }

  val mm2Oracle: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
      |    hex(CAST(text AS BLOB)) AS h
      |  FROM documents)
      |SELECT media_id, byte_len, 16 AS feature_dim,
      |  array_to_string(list_transform(range(0, 16), bin ->
      |    CAST(len(list_filter(range(1, byte_len + 1), i ->
      |      CAST(concat('0x', substr(h, 2 * i - 1, 2)) AS INTEGER) % 16
      |        = bin)) AS VARCHAR)), ',') AS hist_csv
      |FROM b""".stripMargin

  /** mm3 — the frame-sample/resize stage. Byte decimation length and the
    * metadata transform are deterministic arithmetic over the synthetic
    * table, so the stage is fully oracle-checkable; the exact sampled
    * BYTES (which no SQL oracle can re-derive byte-for-byte cheaply) are
    * pinned in MultimodalSpec. */
  def mm3MediaSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.syntheticMediaTable(
      graft.core.Tables.documents(s, d)).as[Multimodal.MediaRecord]
    Multimodal.sampleMedia(media, everyNth = 4).toDF()
      .select($"media_id", length($"content").as("sampled_len"),
        $"format", $"width".as("new_width"), $"height".as("new_height"))
  }

  val mm3Oracle: String =
    """SELECT doc_id AS media_id,
      |  CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS INTEGER)
      |    AS sampled_len,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  CAST((doc_id % 4 * 160 + 320) // 2 AS INTEGER) AS new_width,
      |  CAST((doc_id % 4 * 90 + 180) // 2 AS INTEGER) AS new_height
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_meta" -> (mm1MediaMeta _),
    "mm2_media_features" -> (mm2MediaFeatures _),
    "mm3_media_sample" -> (mm3MediaSample _))

  val oracles: Map[String, String] = Map(
    "mm1_media_meta" -> mm1Oracle,
    "mm2_media_features" -> mm2Oracle,
    "mm3_media_sample" -> mm3Oracle)
}
