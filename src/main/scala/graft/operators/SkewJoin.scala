package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling equi-join: salt the skewed (large) side, replicate the
  * other side across the salt domain, join on (key, salt).
  *
  * When to reach for this instead of AQE's skew-join split: AQE only
  * splits skewed SHUFFLE partitions of sort-merge joins after the fact;
  * deliberate salting also covers broadcast-ineligible hash joins, skew
  * concentrated in a single key (AQE can't split one map key), and
  * aggregate-after-join pipelines where the salt keeps the combine
  * map-side. The cost is a `saltFactor`× replication of the small side —
  * bounded, chosen by the caller.
  *
  * Correctness is salt-invariant: the (key, salt) equi-join emits exactly
  * the rows of the plain key join (oracle-checked by o2_salted_join).
  */
object SkewJoin {

  /** Inner equi-join of `skewed ⋈ other` on `key`, salted `saltFactor`
    * ways. The salt hashes the row's FULL CONTENT — deterministic under
    * task re-execution, which matters: a salt from
    * `monotonically_increasing_id` (or rand) changes when a stage
    * retries after a fetch failure, routing rows to different (key,salt)
    * reducers than the surviving shuffle outputs and silently dropping
    * or duplicating join rows. Identical duplicate rows share a salt
    * (slightly less spreading), which affects balance, never
    * correctness. */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
                      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
