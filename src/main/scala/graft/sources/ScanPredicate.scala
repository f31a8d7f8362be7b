package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The pruning predicates the interop `readWhere` surfaces accept
  * (Iceberg transform-tuple pruning, Delta partitionValues pruning).
  * Both are ALWAYS applied exactly as a residual filter after the
  * file-level prune, so a predicate the partition metadata cannot
  * prune on is never wrong — just unpruned (the manifest lake's
  * fail-open contract, spoken across formats). */
sealed trait ScanPredicate { def column: String }

/** `column = value` (`=` semantics — never matches null; pass a
  * non-null value). */
final case class ScanEq(column: String, value: Any) extends ScanPredicate

/** Closed interval `lo <= column <= hi`. */
final case class ScanBetween(column: String, lo: Any,
                             hi: Any) extends ScanPredicate

private[sources] object ScanPredicates {

  /** The `yyyy-MM-dd HH:mm:ss[.f…]` shape Delta partitionValues and
    * Hive partition directories serialize timestamps in. */
  val PartitionTsFmt: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND,
        1, 9, true)
      .optionalEnd()
      .toFormatter()

  /** Hive %-escaping decode (partition directory names). */
  def unescapePath(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** A predicate value canonicalized to a single comparable shape:
    * integers / date-days / timestamp-micros as Left, strings as
    * Right; anything else fails open (None). */
  def canonicalValue(dt: DataType, v: Any): Option[Either[Long, String]] =
    (dt, v) match {
      case (_, null) => None
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        Some(Left(n.longValue))
      case (DateType, d: java.time.LocalDate) => Some(Left(d.toEpochDay))
      case (DateType, d: java.sql.Date) =>
        Some(Left(d.toLocalDate.toEpochDay))
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(Left(Math.multiplyExact(Math.floorDiv(t.getTime, 1000L),
          1000000L) + t.getNanos / 1000))
      case (TimestampType, i: java.time.Instant) =>
        Some(Left(Math.multiplyExact(i.getEpochSecond, 1000000L) +
          i.getNano / 1000))
      case (TimestampNTZType, dt2: java.time.LocalDateTime) =>
        Some(Left(Math.multiplyExact(
          dt2.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
          dt2.getNano / 1000))
      case (StringType, s: String) => Some(Right(s))
      case _ => None
    }

  def compareValues(a: Either[Long, String],
                    b: Either[Long, String]): Option[Int] =
    (a, b) match {
      case (Left(x), Left(y)) => Some(java.lang.Long.compare(x, y))
      case (Right(x), Right(y)) => Some(utf8Compare(x, y))
      case _ => None
    }

  /** Unsigned UTF-8 byte order — code-point order, the collation both
    * Iceberg bounds and Spark's UTF8String comparisons use (Java
    * String.compareTo differs on supplementary characters). */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Row count + per-column bounds from one staged file's parquet
    * footer (one open, shared by both) — what the interop WRITERS
    * record so their own tables prune. A column records a bound only
    * when EVERY row group carries stats with non-null values —
    * partial coverage must never prune a matching file — and only for
    * the types the canonical compare shape models; oversized string
    * bounds drop (a truncated upper bound would need round-up padding
    * to stay sound, which full values get for free). */
  def footerStats(spark: org.apache.spark.sql.SparkSession,
      p: org.apache.hadoop.fs.Path, schema: StructType)
      : (Long, Map[String, Either[Long, String]],
        Map[String, Either[Long, String]]) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount.toLong).sum
      val lower = Map.newBuilder[String, Either[Long, String]]
      val upper = Map.newBuilder[String, Either[Long, String]]
      schema.fields.foreach { f =>
        val modeled = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType | DateType |
               TimestampType | TimestampNTZType | StringType => true
          case _ => false
        }
        if (modeled && blocks.nonEmpty) {
          val perBlock = blocks.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == f.name)
              .map(_.getStatistics)
              .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
              .flatMap { s =>
                (f.dataType, s.genericGetMin, s.genericGetMax) match {
                  case (StringType,
                    mn: org.apache.parquet.io.api.Binary,
                    mx: org.apache.parquet.io.api.Binary)
                    if mn.length <= 96 && mx.length <= 96 =>
                    Some((Right(new String(mn.getBytes,
                        StandardCharsets.UTF_8)): Either[Long, String],
                      Right(new String(mx.getBytes,
                        StandardCharsets.UTF_8)): Either[Long, String]))
                  case (_, mn: Number, mx: Number) =>
                    Some((Left(mn.longValue): Either[Long, String],
                      Left(mx.longValue): Either[Long, String]))
                  case _ => None
                }
              }
          }
          if (perBlock.forall(_.isDefined)) {
            def cmp(a: Either[Long, String], b: Either[Long, String]): Int =
              compareValues(a, b).getOrElse(0)
            val los = perBlock.flatten.map(_._1)
            val his = perBlock.flatten.map(_._2)
            lower += f.name ->
              los.reduce((a, b) => if (cmp(a, b) <= 0) a else b)
            upper += f.name ->
              his.reduce((a, b) => if (cmp(a, b) >= 0) a else b)
          }
        }
      }
      (rows, lower.result(), upper.result())
    } finally reader.close()
  }

  /** The exact residual every pruned read ends with. */
  def residual(df: DataFrame, preds: Seq[ScanPredicate]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    preds.foldLeft(df) { (acc, p) =>
      p match {
        case ScanEq(c, v) => acc.filter(col(c) === lit(v))
        case ScanBetween(c, lo, hi) =>
          acc.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
      }
    }
  }

  /** Prunable predicates extracted from an UNRESOLVED SQL condition —
    * the interop SQL rules' analog of the lake rule's derived-window
    * extraction. Sound by construction: only TOP-LEVEL conjuncts are
    * read (a file failing one conjunct cannot satisfy the AND), strict
    * bounds prune as their closed counterparts (the boundary file is
    * KEPT), and the original Filter stays in the plan, so an
    * extraction miss costs pruning, never rows. Ranges need BOTH
    * bounds (the lake precedent); equality needs one literal. */
  def fromSqlCondition(
      cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[ScanPredicate] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    def litVal(e: Expression): Option[Any] = e match {
      case Literal(v, dt) if v != null => external(v, dt)
      case _ => None
    }
    val eqs = Seq.newBuilder[ScanPredicate]
    val lows = scala.collection.mutable.Map.empty[String, List[Any]]
    val highs = scala.collection.mutable.Map.empty[String, List[Any]]
    def low(c: Option[String], v: Option[Any]): Unit =
      for (cc <- c; vv <- v) lows(cc) = vv :: lows.getOrElse(cc, Nil)
    def high(c: Option[String], v: Option[Any]): Unit =
      for (cc <- c; vv <- v) highs(cc) = vv :: highs.getOrElse(cc, Nil)
    conjuncts(cond).foreach {
      case EqualTo(a, l) if attr(a).isDefined && litVal(l).isDefined =>
        eqs += ScanEq(attr(a).get, litVal(l).get)
      case EqualTo(l, a) if attr(a).isDefined && litVal(l).isDefined =>
        eqs += ScanEq(attr(a).get, litVal(l).get)
      // `col >= lit` is a lower bound; `lit >= col` an upper one —
      // at most one side is an attribute, so both calls are safe
      case GreaterThanOrEqual(x, y) =>
        low(attr(x), litVal(y)); high(attr(y), litVal(x))
      case GreaterThan(x, y) =>
        low(attr(x), litVal(y)); high(attr(y), litVal(x))
      case LessThanOrEqual(x, y) =>
        high(attr(x), litVal(y)); low(attr(y), litVal(x))
      case LessThan(x, y) =>
        high(attr(x), litVal(y)); low(attr(y), litVal(x))
      case _ => ()
    }
    val ranges = (lows.keySet & highs.keySet).toSeq.flatMap { c =>
      for (lo <- lows(c); hi <- highs(c)) yield ScanBetween(c, lo, hi)
    }
    eqs.result() ++ ranges
  }

  /** A catalyst literal's internal value lifted to the external shape
    * [[canonicalValue]] models; None = not a prunable shape. */
  private def external(v: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = dt match {
    case StringType => Some(v.toString)
    case ByteType | ShortType | IntegerType | LongType => Some(v)
    case DateType => Some(java.time.LocalDate.ofEpochDay(
      v.asInstanceOf[Number].longValue))
    case TimestampType =>
      val us = v.asInstanceOf[Number].longValue
      Some(java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L))
    case TimestampNTZType =>
      val us = v.asInstanceOf[Number].longValue
      Some(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    case _ => None
  }
}
