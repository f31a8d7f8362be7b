package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, HyperplaneSketch, MinHashSignature, NgramContainment, NgramJaccard, RepetitionProfile, ShingleHashes, SimHash64, WinnowFingerprint}

/** Engine extension point (`spark.sql.extensions` /
  * `SparkSession.builder.withExtensions`): registers the engine's native
  * Catalyst functions so they're first-class in both the Column API and
  * SQL. Also surfaces Spark's internal bloom-filter expressions (used by
  * AQE's runtime filters but absent from the public registry) — the
  * building blocks of [[graft.operators.BloomJoin]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Tuning parameters of the native kernels (shingle width, hash count,
    * plane count) shape the expression tree itself, so in SQL form they
    * must be literal ints. */
  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got ${e.sql}")
  }

  /** A wrong argument count must name the expected signature, not
    * surface as an IndexOutOfBoundsException from exprs(n). */
  private def arity(exprs: Seq[Expression], n: Int, sig: String): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"expected $sig, got ${exprs.length} argument(s)")

  override def apply(extensions: SparkSessionExtensions): Unit = {
    // SQL DML + time travel over manifest-lake tables (MERGE INTO /
    // DELETE FROM / INSERT / VERSION AS OF on graft_lake.<name>) —
    // resolution-rule rewrite, keeping the native parquet read path
    extensions.injectResolutionRule(spark =>
      new graft.sources.LakeSql.LakeSqlRule(spark))
    // SQL reads + VERSION AS OF over Delta-log tables
    // (graft_delta.<name>) — same rewrite approach, read-only surface
    extensions.injectResolutionRule(spark =>
      new graft.sources.DeltaSql.DeltaSqlRule(spark))
    // SQL reads + VERSION AS OF <snapshot-id> over Iceberg tables
    // (graft_iceberg.<name>)
    extensions.injectResolutionRule(spark =>
      new graft.sources.IcebergSql.IcebergSqlRule(spark))
    // SQL reads over Delta Sharing tables
    // (graft_delta_sharing.<alias>) — provider-current per query,
    // read-only by the protocol
    extensions.injectResolutionRule(spark =>
      new graft.sources.DeltaSharing.DeltaSharingSqlRule(spark))
    // maintenance statements Spark's grammar lacks (OPTIMIZE / VACUUM /
    // DESCRIBE HISTORY on graft_lake tables) — a delegating parser, the
    // public Delta-connector idiom
    extensions.injectParser((_, delegate) =>
      new graft.sources.LakeMaintenanceSql.Parser(delegate))
    extensions.injectFunction(CosineSimilarity.registration)
    extensions.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "simhash64(text)")
        SimHash64(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "minhash_signature(text, shingleWidth, numHashes)")
        MinHashSignature(exprs.head,
          litInt(exprs(1), "minhash_signature"),
          litInt(exprs(2), "minhash_signature"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("ngram_jaccard"),
      new ExpressionInfo(classOf[NgramJaccard].getName, "ngram_jaccard"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "ngram_jaccard(textA, textB, shingleWidth)")
        NgramJaccard(exprs.head, exprs(1), litInt(exprs(2), "ngram_jaccard"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("ngram_containment"),
      new ExpressionInfo(classOf[NgramContainment].getName,
        "ngram_containment"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "ngram_containment(textA, textB, shingleWidth)")
        NgramContainment(exprs.head, exprs(1),
          litInt(exprs(2), "ngram_containment"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "shingle_hashes(text, shingleWidth)")
        ShingleHashes(exprs.head, litInt(exprs(1), "shingle_hashes"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("hyperplane_sketch"),
      new ExpressionInfo(classOf[HyperplaneSketch].getName,
        "hyperplane_sketch"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "hyperplane_sketch(vec, nPlanes)")
        HyperplaneSketch(exprs.head, litInt(exprs(1), "hyperplane_sketch"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        "winnow_fingerprint"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "winnow_fingerprint(text, k, window)")
        WinnowFingerprint(exprs.head,
          litInt(exprs(1), "winnow_fingerprint"),
          litInt(exprs(2), "winnow_fingerprint"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("repetition_profile"),
      new ExpressionInfo(classOf[RepetitionProfile].getName,
        "repetition_profile"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "repetition_profile(text)")
        RepetitionProfile(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, items) => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) =>
          new BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(child[, estimatedItems[, numBits]])")
      }))
    extensions.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs.head, exprs(1))))
  }
}
