package graft.ml

import java.sql.Timestamp

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The weighted K-Means geo-clustering job (SURVEY §2.6 M1+M2, §2.2 P4/P6;
  * reference `/root/reference/dags/lib/k_means_with_spark.py:101-172`).
  *
  * Two weighting modes:
  *   - [[WeightedKMeans.Replication]] — the reference's trick: replicate
  *     each point `weight` times via `explode(array_repeat(struct(lat,lon),
  *     weight))`, then run unweighted K-Means. Faithful, but the row count
  *     blows up by Σweight — O(total bikes) instead of O(stations). Kept
  *     as the parity mode.
  *   - [[WeightedKMeans.NativeWeight]] — `KMeans.setWeightCol("weight")`
  *     optimizes the identical objective (Σ wᵢ·‖xᵢ−c‖²) with NO row
  *     replication; this is the 100 TB path and the default. The two modes
  *     agree on the objective within convergence tolerance
  *     (WeightedKMeansSpec pins this).
  *
  * Null geo points are skipped (`VectorAssembler.handleInvalid="skip"`) —
  * the reference would crash on a null lat; skipping is the engine-defined
  * behavior, counted nowhere else.
  */
object WeightedKMeans {

  sealed trait Mode
  case object Replication extends Mode
  case object NativeWeight extends Mode

  /** k=12, seed=1 — the reference's exact config
    * (`k_means_with_spark.py:136`). */
  final case class Params(k: Int = 12, seed: Long = 1L,
                          mode: Mode = NativeWeight)

  /** The time window holds no trainable points (all rows filtered out or
    * null-geo). The reference crashes deep inside the summarizer here;
    * we surface it as a typed, skippable condition. */
  final class EmptyWindowException(start: Timestamp, end: Timestamp)
    extends RuntimeException(
      s"no trainable points in window [$start, $end] — nothing to cluster")

  /** P4 + F9/F10: closed-interval time filter (bounds computed driver-side
    * by the caller — keep the clock injectable) and the weight clamp
    * `weight = max(int(num_bikes), 1)`. */
  def prepare(enriched: DataFrame, start: Timestamp, end: Timestamp): DataFrame =
    enriched
      .filter(col("time") >= lit(start) && col("time") <= lit(end))
      .withColumn("weight", col("num_bikes").cast("int"))
      .withColumn("weight",
        when(col("weight") > 0, col("weight")).otherwise(1))

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(Array("lat", "lon"))
      .setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(df)

  /** Fit + transform. Returns the serving-shaped result (one row per input
    * point — replicated in parity mode — with `prediction` appended) and
    * the fitted model for objective inspection. */
  def run(enriched: DataFrame, start: Timestamp, end: Timestamp,
          params: Params = Params()): (DataFrame, KMeansModel) = {
    val prepared = prepare(enriched, start, end)

    val (trainDf, resultDf) = params.mode match {
      case Replication =>
        // P6: one row per bike — the aggregate objective is identical to
        // the weighted form because replication IS integer weighting.
        val replicated = prepared
          .withColumn("dummy",
            explode(array_repeat(struct(col("lat"), col("lon")), col("weight"))))
          .select(col("provider"), col("id"),
            col("dummy.lat").as("lat"), col("dummy.lon").as("lon"),
            col("time"), col("num_bikes"), col("num_docks"))
        val assembled = assemble(replicated)
        (assembled, assembled)
      case NativeWeight =>
        val assembled = assemble(prepared)
        (assembled, assembled)
    }

    if (trainDf.isEmpty) throw new EmptyWindowException(start, end)

    val kmeans = new KMeans().setK(params.k).setSeed(params.seed)
    val configured = params.mode match {
      case NativeWeight => kmeans.setWeightCol("weight")
      case Replication => kmeans
    }
    val model = configured.fit(trainDf)
    val predicted = model.transform(resultDf)

    // Serving projection (F5/F7/P3): id_concat key, [lon,lat] geo array.
    val served = predicted
      .withColumn("id_concat",
        concat(col("id"), lit("_"), col("time").cast("string")))
      .withColumn("location", array(col("lon"), col("lat")))
      .drop("lat", "lon")
      .select(col("provider"), col("id_concat"), col("location"), col("time"),
        col("num_bikes"), col("num_docks"), col("prediction"))
    (served, model)
  }

  /** Weighted within-cluster sum of squares — the objective both modes
    * optimize; used for cross-mode tolerance checks. */
  def wssse(model: KMeansModel): Double = model.summary.trainingCost
}
