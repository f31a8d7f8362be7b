package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar-function and row-shape operator families — SURVEY.md §2.2 (P1-P6),
  * §2.3 (F1-F13), §2.4 (E1). Each query exercises the operator on the driver
  * test tables with a DuckDB-checkable output; the GBFS-specific semantics
  * (null-swallowing booleans, float narrowing, the timestamp dance) are
  * additionally pinned by fixture tests in `graft.bike`.
  */
object ScalarOps {

  /** p4_time_filter — closed-interval time-range predicate (SURVEY §2.2 P4:
    * the reference's trailing-90-minute window,
    * `/root/reference/dags/lib/k_means_with_spark.py:26-39,108-110`).
    * Bounds are driver-computed literals so the filter pushes down to
    * parquet row-group stats — at 100 TB on a time-partitioned lake this is
    * partition pruning, the single most important scan optimization.
    * Timestamps are emitted as epoch micros to make the comparison
    * engine-neutral.
    */
  def p4TimeFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Filter on the column AS STORED so the predicate pushes down to the
    // parquet scan (row-group/partition pruning — the single most
    // important scan optimization at 100 TB). Filtering above a computed
    // conversion (`timestamp_micros(ts div 1000)`, a cast) would defeat
    // pushdown, so the bound literals adapt to the stored type instead:
    // raw nanos Longs for the INT64(NANOS) generation of events.parquet,
    // LocalDateTime (TIMESTAMP_NTZ) literals for the TIMESTAMP(MICROS)
    // one — both compare scan-native and prune row groups.
    val start = java.time.LocalDateTime.parse("2024-01-10T00:00:00")
    val end = java.time.LocalDateTime.parse("2024-01-11T12:00:00")
    val raw = Tables.load(s, d, "events")
    val bounded = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val ns = (t: java.time.LocalDateTime) =>
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
        raw.filter($"ts" >= ns(start) && $"ts" <= ns(end))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.filter($"ts" >= lit(start) && $"ts" <= lit(end))
      case _ =>
        val inst = (t: java.time.LocalDateTime) =>
          java.sql.Timestamp.from(t.toInstant(java.time.ZoneOffset.UTC))
        raw.filter($"ts" >= lit(inst(start)) && $"ts" <= lit(inst(end)))
    }
    Tables.normalizeEventTs(bounded)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id",
        $"event_type", $"value")
  }

  val p4Oracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-11 12:00:00'""".stripMargin

  /** p5_explode — array-of-X to one-row-per-element (SURVEY §2.2 P5:
    * `explode(col("data.stations"))`). `posexplode` = Catalyst Generate,
    * a narrow (no-shuffle) operator.
    */
  def p5Explode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", posexplode($"embedding"))
      .withColumnRenamed("col", "val")
  }

  val p5Oracle: String =
    """SELECT vec_id, CAST(unnest(range(len(embedding))) AS INT) AS pos,
      |  unnest(embedding) AS val
      |FROM embeddings""".stripMargin

  /** p6_weighted_replication — `explode(array_repeat(struct(...), w))`
    * (SURVEY §2.2 P6 + F9-F12: the reference's weighted-KMeans row blowup,
    * `/root/reference/dags/lib/k_means_with_spark.py:114-125`, including the
    * `IF(weight > 0, weight, 1)` clamp). The aggregate proves the replicated
    * cardinality equals Σ max(weight,1) exactly.
    */
  def p6WeightedReplication(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .withColumn("weight", $"l_quantity".cast("int"))
      .withColumn("weight", when($"weight" > 0, $"weight").otherwise(1))
      .select($"l_returnflag",
        explode(array_repeat(struct($"l_orderkey", $"l_linenumber"), $"weight"))
          .as("point"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_points"))
  }

  val p6Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN CAST(l_quantity AS INT) > 0
      |    THEN CAST(l_quantity AS INT) ELSE 1 END) AS BIGINT) AS n_points
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** f1_f2_timestamp_dance — the reference's two-step unix→string→timestamp
    * conversion (SURVEY §2.3 F1+F2,
    * `/root/reference/dags/lib/transform_ss_velib_with_spark.py:64,101-102`).
    * Kept form-for-form (from_unixtime then to_timestamp) under a pinned UTC
    * session; the single-step `timestamp_seconds` equivalent is asserted
    * equal in ScalaTest.
    */
  def f1F2TimestampDance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", unix_seconds($"ts").as("epoch_s"))
      .withColumn("ts_str", from_unixtime($"epoch_s"))
      .withColumn("ts_roundtrip", to_timestamp($"ts_str"))
      .select($"event_id", $"epoch_s", $"ts_str",
        unix_micros($"ts_roundtrip").as("ts_roundtrip_us"))
  }

  val f1F2Oracle: String =
    """SELECT event_id, epoch_us(ts) // 1000000 AS epoch_s,
      |  strftime(to_timestamp(epoch_us(ts) // 1000000), '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  (epoch_us(ts) // 1000000) * 1000000 AS ts_roundtrip_us
      |FROM events""".stripMargin

  /** f3_f4_when_coercion — both `when(...).otherwise(false)` boolean
    * coercion flavors (SURVEY §2.3 F3 int flags, F4 string flags), with the
    * reference's exact null-swallowing semantics: NULL input falls through
    * to the otherwise-branch and becomes false, not NULL
    * (`/root/reference/dags/lib/transform_lime_with_spark.py:99-100`).
    */
  def f3F4WhenCoercion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id",
        when($"value" > 5.0, 1).otherwise(0).as("flag_int"),
        when($"event_type" === "click", "true")
          .when($"event_type" === "view", lit(null))
          .otherwise("false").as("flag_str"))
      .select($"event_id",
        when($"flag_int" === 1, true).otherwise(false).as("b_int"),
        when($"flag_str" === "true", true).otherwise(false).as("b_str"))
  }

  val f3F4Oracle: String =
    """SELECT event_id,
      |  CASE WHEN (CASE WHEN value > 5.0 THEN 1 ELSE 0 END) = 1
      |    THEN true ELSE false END AS b_int,
      |  CASE WHEN (CASE WHEN event_type = 'click' THEN 'true'
      |             WHEN event_type = 'view' THEN NULL
      |             ELSE 'false' END) = 'true'
      |    THEN true ELSE false END AS b_str
      |FROM events""".stripMargin

  /** e1_schema_enforce — declared-schema enforcement as a Catalyst-native
    * cast projection (SURVEY §2.4 E1). The reference achieves this with a
    * plan-severing `createDataFrame(df.rdd, schema)` round-trip; a
    * `select(cast)` produces the identical result schema (Long→Int,
    * Double→Float narrowing) in one codegen stage with pushdown intact —
    * the engine's headline optimizer win (SURVEY §4.3).
    */
  def e1SchemaEnforce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select(
      $"c_custkey".cast("int").as("custkey"),
      $"c_name".as("name"),
      $"c_acctbal".cast("float").as("acctbal"),
      $"c_mktsegment".as("segment"))
  }

  val e1Oracle: String =
    """SELECT CAST(c_custkey AS INTEGER) AS custkey, c_name AS name,
      |  CAST(c_acctbal AS REAL) AS acctbal, c_mktsegment AS segment
      |FROM customer""".stripMargin

  /** f5_id_concat — serving-layer document identity (SURVEY §2.3 F5-F8:
    * `concat(col("id"), lit("_"), col("time").cast("string"))`,
    * `/root/reference/dags/lib/index_to_elastic_with_spark.py:133`). The
    * time component is epoch micros so the string form is engine-neutral;
    * the timestamp-string flavor is pinned in the bike fixture tests.
    */
  def f5IdConcat(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select($"event_id",
      concat($"user_id".cast("string"), lit("_"),
        unix_micros($"ts").cast("string")).as("id_concat"))
  }

  val f5Oracle: String =
    """SELECT event_id,
      |  CAST(user_id AS VARCHAR) || '_' || CAST(epoch_us(ts) AS VARCHAR)
      |    AS id_concat
      |FROM events""".stripMargin

  /** f7_geo_array — `array(lon, lat)` packing for geo serving (SURVEY §2.3
    * F7, `/root/reference/dags/lib/index_to_elastic_with_spark.py:134`).
    * The array is built exactly as the serving layer does, then projected
    * back to its elements for the gate: the driver's pandas comparison
    * cannot hash raw array cells (r2 `err`), and `element_at` round-trips
    * the construction so the operator is still what's under test.
    */
  def f7GeoArray(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", array($"value", $"value" * lit(2.0)).as("location"))
      .select($"event_id",
        element_at($"location", 1).as("location_lon"),
        element_at($"location", 2).as("location_lat"),
        size($"location").as("location_len"))
  }

  val f7Oracle: String =
    """SELECT event_id, value AS location_lon, value * 2.0 AS location_lat,
      |  2 AS location_len
      |FROM events""".stripMargin

  /** f15_json_props — JSON string-column functions (path extraction and
    * schema-ful parsing). `from_json` with a declared schema is the scale
    * path: one parse per row into a struct Catalyst can prune; repeated
    * `get_json_object` calls re-parse per path. */
  def f15JsonProps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    Tables.events(s, d).select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("k_path"),
      from_json($"props", StructType(Seq(StructField("k", IntegerType))))
        .getField("k").as("k_parsed"))
  }

  val f15Oracle: String =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS INTEGER) AS k_path,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_parsed
      |FROM events""".stripMargin

  /** f16_array_hof — the higher-order array-function surface (`filter`,
    * `transform`, `aggregate`) over a tokenized text column, projected
    * to SCALARS for the gate (nested outputs crash the driver compare).
    * HOFs evaluate interpreted in Spark — fine for ad-hoc analytics like
    * this; hot per-row kernels belong in native expressions (the
    * `graft.functions` pattern), which is why the dedup chains never
    * went through HOFs. */
  def f16ArrayHof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    Tables.documents(s, d).select(
      $"doc_id",
      size(toks).as("n_tokens"),
      size(filter(toks, t => length(t) > 4)).as("n_long"),
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
        (acc, x) => acc + x).as("total_chars"))
  }

  val f16Oracle: String =
    """SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_tokens,
      |  CAST(len(list_filter(toks, t -> len(t) > 4)) AS INTEGER) AS n_long,
      |  CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0)
      |    AS BIGINT) AS total_chars
      |FROM (SELECT doc_id,
      |        list_filter(string_split_regex(text, '\s+'), t -> t <> '')
      |          AS toks
      |      FROM documents)""".stripMargin

  /** w3_window_dist — the distribution window functions (`ntile`,
    * `percent_rank`, `cume_dist`) over a per-user value ordering. The
    * event_id tie-break makes every peer group a single row, so the
    * rank fractions are the same exact rational in both engines (one
    * IEEE division each). */
  def w3WindowDist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"value".asc, $"event_id".asc)
    Tables.events(s, d).select(
      $"user_id", $"event_id",
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  val w3Oracle: String =
    """SELECT user_id, event_id,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin

  /** f17_regex_strings — the regex + string-distance function family:
    * `regexp_extract` (first long word), `regexp_count` (non-overlapping
    * occurrence count), `levenshtein`, `translate`. No-match extract is
    * empty-string in Spark and NULL in DuckDB — the oracle coalesces to
    * '' so both engines agree on the miss representation. */
  def f17RegexStrings(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      regexp_extract($"text", "([a-z]{8,})", 1).as("first_long"),
      regexp_count($"text", lit("the")).as("n_the"),
      levenshtein($"lang", $"source").as("lev"),
      translate($"lang", "aeiou", "AEIOU").as("lang_caps"))
  }

  val f17Oracle: String =
    """SELECT doc_id,
      |  coalesce(regexp_extract(text, '([a-z]{8,})', 1), '')
      |    AS first_long,
      |  CAST(len(regexp_extract_all(text, 'the')) AS INTEGER) AS n_the,
      |  CAST(levenshtein(lang, source) AS INTEGER) AS lev,
      |  translate(lang, 'aeiou', 'AEIOU') AS lang_caps
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f17_regex_strings" -> (f17RegexStrings _),
    "f16_array_hof" -> (f16ArrayHof _),
    "w3_window_dist" -> (w3WindowDist _),
    "f15_json_props" -> (f15JsonProps _),
    "p4_time_filter" -> (p4TimeFilter _),
    "p5_explode" -> (p5Explode _),
    "p6_weighted_replication" -> (p6WeightedReplication _),
    "f1_f2_timestamp_dance" -> (f1F2TimestampDance _),
    "f3_f4_when_coercion" -> (f3F4WhenCoercion _),
    "e1_schema_enforce" -> (e1SchemaEnforce _),
    "f5_id_concat" -> (f5IdConcat _),
    "f7_geo_array" -> (f7GeoArray _))

  val oracles: Map[String, String] = Map(
    "f17_regex_strings" -> f17Oracle,
    "f16_array_hof" -> f16Oracle,
    "w3_window_dist" -> w3Oracle,
    "f15_json_props" -> f15Oracle,
    "p4_time_filter" -> p4Oracle,
    "p5_explode" -> p5Oracle,
    "p6_weighted_replication" -> p6Oracle,
    "f1_f2_timestamp_dance" -> f1F2Oracle,
    "f3_f4_when_coercion" -> f3F4Oracle,
    "e1_schema_enforce" -> e1Oracle,
    "f5_id_concat" -> f5Oracle,
    "f7_geo_array" -> f7Oracle)
}
