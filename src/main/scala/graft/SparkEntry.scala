package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from SURVEY.md §2
  * (plus the training-data-pipeline extension operators) to a DataFrame
  * program over the driver test tables; `oracleSql` holds the equivalent
  * DuckDB SQL for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the R1 broadcast-join + aggregate path end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.r1JoinBroadcast(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ ScalarOps.queries ++
      graft.bike.BikeQueries.queries ++
      graft.text.TextQueries.queries ++
      graft.text.DedupQueries.queries ++
      graft.ann.AnnQueries.queries ++
      graft.multimodal.MultimodalQueries.queries ++
      graft.streaming.StreamingQueries.queries ++
      graft.text.CurationQueries.queries ++
      graft.operators.TemporalQueries.queries ++
      graft.operators.GraphQueries.queries ++
      graft.operators.SpatialQueries.queries ++
      graft.operators.BasketQueries.queries ++
      graft.ml.MlQueries.queries ++
      graft.text.CorpusQueries.queries ++
      graft.sources.LakeQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ ScalarOps.oracles ++
      graft.bike.BikeQueries.oracles ++
      graft.text.TextQueries.oracles ++
      graft.text.DedupQueries.oracles ++
      graft.ann.AnnQueries.oracles ++
      graft.multimodal.MultimodalQueries.oracles ++
      graft.streaming.StreamingQueries.oracles ++
      graft.text.CurationQueries.oracles ++
      graft.operators.TemporalQueries.oracles ++
      graft.operators.GraphQueries.oracles ++
      graft.operators.SpatialQueries.oracles ++
      graft.operators.BasketQueries.oracles ++
      graft.ml.MlQueries.oracles ++
      graft.text.CorpusQueries.oracles ++
      graft.sources.LakeQueries.oracles
}
