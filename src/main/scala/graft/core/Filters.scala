package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A partition-level filter: `partition <comparison> value` for any of
  * `values` (OR-folded across the value list, matching the reference's
  * semantics of applying the comparison per-value and unioning matches —
  * s3parq fetch_parq.py:450-478).
  *
  * Comparisons: `== != > < >= <=`. Range comparisons accept exactly one
  * value (fetch_parq.py:588-614); `==` with a value list is the reference's
  * "in" form.
  */
final case class ColFilter(partition: String, comparison: String, values: Seq[Any])

object Filters {

  /** Comparison ops supported by the reference (fetch_parq.py:29). */
  val Ops: Set[String] = Set("==", "!=", ">", "<", ">=", "<=")

  private val SingleValueOps = Set(">", "<", ">=", "<=")

  /** Partition types on which range comparisons are rejected
    * (fetch_parq.py:38 NON_NUM_TYPES: string/category/bool).
    */
  private def isNonNumeric(dt: DataType): Boolean = dt match {
    case StringType | BooleanType => true
    case _ => false
  }

  /** Structural filter validation (fetch_parq.py:588 `_validate_filter_rules`). */
  def validateRules(filters: Seq[ColFilter]): Unit =
    filters.foreach { f =>
      require(f.partition != null && f.partition.nonEmpty,
        "Filters require partition, comparison, and values.")
      require(Ops.contains(f.comparison), s"Comparison ${f.comparison} is not supported.")
      if (SingleValueOps.contains(f.comparison))
        require(f.values.length == 1,
          s"Comparison ${f.comparison} can only be used with one filter value.")
    }

  /** Type-compatibility validation against the dataset's partition types
    * (fetch_parq.py:617 `_validate_matching_filter_data_type`). Values must
    * be representable in the partition's type — a string value for an int
    * partition that doesn't parse raises here instead of silently matching
    * nothing (the reference fails the same way inside `convert_type`).
    */
  def validateAgainst(meta: DatasetMeta, filters: Seq[ColFilter]): Unit =
    filters.foreach { f =>
      require(meta.partitions.contains(f.partition),
        "Filter does not have a matching partition.")
      val dt = meta.partitionType(f.partition)
      validateTyped(f, dt)
    }

  /** [[validateAgainst]] for DATA-column filters (fetchIndexed): the column
    * must exist and not be a partition (partition predicates go through the
    * partition-pruning path, which is strictly cheaper).
    */
  def validateDataFilters(meta: DatasetMeta, filters: Seq[ColFilter]): Unit =
    filters.foreach { f =>
      require(meta.dataColumns.contains(f.partition),
        s"Data filter column ${f.partition} is not a data column of the dataset.")
      validateTyped(f, meta.schema(f.partition).dataType)
    }

  private[core] def validateTyped(f: ColFilter, dt: DataType): Unit = {
      if (SingleValueOps.contains(f.comparison))
        require(!isNonNumeric(dt),
          s"Comparison ${f.comparison} cannot be used on partition types of $dt")
      f.values.foreach { v =>
        try checkValue(v, dt)
        catch {
          case e: IllegalArgumentException => throw e
          case _: Exception => throw new IllegalArgumentException(
            s"Filter value $v cannot be converted to partition type $dt")
        }
      }
    }

  /** Throws unless `v` is representable in `dt` (strings are parsed). A
    * fractional or out-of-range value for an integral partition is
    * rejected — casting it would truncate and silently match the WRONG
    * partition (1.5 == int partition would become 1 == partition).
    */
  private def checkValue(v: Any, dt: DataType): Unit = {
    def asLong: Option[Long] = v match {
      case i: Int => Some(i.toLong); case l: Long => Some(l)
      case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
      // whole-valued fractional types are exactly representable (2024.0
      // filtering an int partition is fine; 1.5 is not)
      case d: Double if d.isWhole && d.abs <= Long.MaxValue.toDouble => Some(d.toLong)
      case f: Float if f.isWhole && f.abs <= Long.MaxValue.toFloat => Some(f.toLong)
      case bd: BigDecimal if bd.isWhole && bd.isValidLong => Some(bd.toLong)
      case _ => None
    }
    def inRange(lo: Long, hi: Long): Unit = asLong match {
      case Some(l) => require(l >= lo && l <= hi,
        s"Filter value $v out of range for partition type $dt")
      case None => throw new IllegalArgumentException(
        s"Filter value $v (${v.getClass.getSimpleName}) is not integral; partition type is $dt")
    }
    (v, dt) match {
      case (s: String, t) if t != StringType => Fetch.parseValue(s, t)
      case (_: String, StringType) => ()
      case (_: Boolean, BooleanType) => ()
      case (_, IntegerType) => inRange(Int.MinValue, Int.MaxValue)
      case (_, LongType) => inRange(Long.MinValue, Long.MaxValue)
      case (_, ShortType) => inRange(Short.MinValue, Short.MaxValue)
      case (_, ByteType) => inRange(Byte.MinValue, Byte.MaxValue)
      case (_: Int | _: Long | _: Short | _: Byte | _: Float | _: Double | _: BigDecimal,
            FloatType | DoubleType | _: DecimalType) => ()
      case (_: java.sql.Timestamp, TimestampType | TimestampNTZType) => ()
      case (_: java.sql.Date, DateType) => ()
      // java.time flavors: V2 pushed filters carry LocalDateTime for NTZ
      // columns (and Instant/LocalDate under the java8 datetime API)
      case (_: java.time.LocalDateTime, TimestampNTZType) => ()
      case (_: java.time.Instant, TimestampType) => ()
      case (_: java.time.LocalDate, DateType) => ()
      case _ => throw new IllegalArgumentException(
        s"Filter value $v (${v.getClass.getSimpleName}) does not match partition type $dt")
    }
  }

  /** Compile filters to ONE Catalyst predicate over partition columns.
    *
    * The partition column is cast to its logical type from the dataset
    * sidecar before comparison, so hive-directory strings compare typed
    * (the Spark analogue of the reference's typed key pruning,
    * fetch_parq.py:421-447). The predicate references only partition
    * columns, so Catalyst evaluates it driver-side against the partition
    * spec (`PartitionFilters`): non-matching directories are never even
    * planned as splits — nothing is read from them.
    *
    * An empty value list compiles to `false` (matches the reference:
    * no value ⇒ no matching partitions ⇒ empty frame with headers).
    */
  def compile(meta: DatasetMeta, filters: Seq[ColFilter]): Option[Column] =
    compileOn(meta.partitionType, filters)

  /** [[compile]] generalized over any column-type lookup — the same
    * predicate compiler serves data-column filters ([[Fetch.fetchIndexed]]),
    * where the type comes from the full schema instead of the partition
    * list.
    */
  def compileOn(typeOf: String => DataType, filters: Seq[ColFilter]): Option[Column] = {
    val preds = filters.map { f =>
      val dt = typeOf(f.partition)
      val c = col(f.partition).cast(dt)
      f.comparison match {
        // Multi-value `==` is the reference's "in" form — compile it to a
        // genuine Catalyst `In`, not an Or(EqualTo) fold: `In` translates
        // to ONE pushed `In(col, values)` parquet filter, converts to the
        // hash-set `InSet` past spark.sql.optimizer.inSetConversionThreshold
        // (an Or tree stays O(values) per row forever), and keeps a
        // 1,000-value filter list from building a 1,000-deep expression
        // tree. (`!=` keeps its per-value OR fold: the reference's
        // documented semantics there are a tautology for ≥2 distinct
        // values — value-wise union, not NOT IN.)
        case "==" if f.values.size > 1 =>
          import org.apache.spark.sql.graft.shim
          shim.column(org.apache.spark.sql.catalyst.expressions.In(
            shim.expression(c),
            f.values.map(v => shim.expression(typedLit(dt, v))).toList))
        case _ =>
          val perValue: Seq[Column] = f.values.map { v =>
            val l = typedLit(dt, v)
            f.comparison match {
              case "==" => c === l
              case "!=" => c =!= l
              case ">"  => c > l
              case "<"  => c < l
              case ">=" => c >= l
              case "<=" => c <= l
            }
          }
          perValue.reduceOption(_ || _).getOrElse(lit(false))
      }
    }
    preds.reduceOption(_ && _)
  }

  /** A literal of the partition's logical type; accepts natural Scala values
    * plus strings (parsed via cast) for every supported partition type.
    */
  private def typedLit(dt: DataType, v: Any): Column = v match {
    case s: String => lit(s).cast(dt)
    case other     => lit(other).cast(dt)
  }
}
