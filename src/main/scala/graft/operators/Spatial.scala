package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Spatial joins over planar point DataFrames — grid-blocked, never
  * all-pairs. (Planar/projected coordinates deliberately: squared
  * Euclidean distance is PURE ARITHMETIC, bit-identical across
  * engines, where a haversine's sin/cos/atan2 differ in the last ulp
  * between libm implementations and a boundary pair could flip — for
  * geodetic data, project first.)
  */
object Spatial {

  /** All pairs of points within `radius`, found by UNIFORM GRID
    * blocking: cell width = radius, so a qualifying pair's cells
    * differ by at most 1 per axis (|dx| ≤ r ⇒ one cell step) — the
    * index side keys each point by its own cell, the probe side emits
    * the 3×3 neighborhood, and a hash join on the cell finds every
    * candidate exactly once (the `index.id < probe.id` order dedups;
    * no DISTINCT pass). Exact-complete by the cell-width argument;
    * the verify is squared-distance arithmetic only.
    *
    * Scale shape: 1 key per point on the index side, 9 on the probe
    * side, ONE cell-keyed shuffle, verification bounded by true
    * candidate density (points-per-cell²) — a hot cell (urban-core
    * skew) bounds like the LSH buckets: cap-and-flag or split the
    * cell by halving the width for its points. Never O(n²). */
  def radiusJoin(points: DataFrame, radius: Double,
                 idCol: String = "id", xCol: String = "x",
                 yCol: String = "y"): DataFrame = {
    require(radius > 0, "radiusJoin needs a positive radius")
    val p = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    def cell(c: org.apache.spark.sql.Column) =
      floor(c / lit(radius)).cast("long")
    val index = p.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), cell(col("x")).as("cx"), cell(col("y")).as("cy"))
    val offsets = Seq(-1L, 0L, 1L)
    val probe = p.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"),
        explode(array(offsets.flatMap(dx => offsets.map(dy =>
          struct((cell(col("x")) + dx).as("cx"),
            (cell(col("y")) + dy).as("cy")))): _*)).as("c"))
      .select(col("id_b"), col("xb"), col("yb"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    index.join(probe, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}

/** Correctness-gate entries for the spatial family. */
object SpatialQueries {

  /** sj1_radius_join — the grid-blocked radius join through the gate:
    * customers mapped to deterministic planar points (integer mixing
    * only — a quadratic term decorrelates the lattice a linear hash
    * draws), all pairs within radius 10, and the oracle BRUTE FORCES
    * the cross product in DuckDB: any pair the 3×3 blocking misses or
    * invents is a hash mismatch, and the squared distances themselves
    * must agree bit for bit (pure arithmetic — no transcendentals on
    * either side). */
  def sj1RadiusJoin(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.customer(s, d).select(
      col("c_custkey").as("id"),
      ((col("c_custkey") * 2654435761L) % 99991L).cast("double")
        ./(lit(100.0)).as("x"),
      ((col("c_custkey") * col("c_custkey") % 99991L * 31L) % 99991L)
        .cast("double")./(lit(100.0)).as("y"))
    Spatial.radiusJoin(pts, radius = 10.0)
  }

  val sj1Oracle: String =
    """WITH p AS (
      |  SELECT c_custkey AS id,
      |    CAST((c_custkey * 2654435761) % 99991 AS DOUBLE) / 100.0 AS x,
      |    CAST(((c_custkey * c_custkey % 99991) * 31) % 99991 AS DOUBLE)
      |      / 100.0 AS y
      |  FROM customer)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |FROM p a JOIN p b ON a.id < b.id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |  <= 100.0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sj1_radius_join" -> (sj1RadiusJoin _))

  val oracles: Map[String, String] = Map(
    "sj1_radius_join" -> sj1Oracle)
}
