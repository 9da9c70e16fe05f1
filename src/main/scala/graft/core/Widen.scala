package graft.core

import org.apache.spark.sql.types._

/** Type-widening schema evolution (the Delta 3.x / Iceberg v3 shape): a
  * producer whose int column outgrows 32 bits appends LONGs and the
  * dataset's recorded type widens — zero bytes of existing data move.
  *
  * Why this is free on the read side: every graft read (fetch, versioned
  * snapshots, mutations' readFiles) scans parquet under the sidecar's
  * EXPLICIT schema, and the Spark 4 vectorized parquet reader natively
  * promotes a narrower physical type to the requested one (int32→int64,
  * int32/float→double, decimal precision/scale growth — probed on this
  * build). Old narrow files and new wide files coexist in one scan.
  *
  * Legal promotions are the LOSSLESS ones only:
  *   byte → short → int → long; byte/short/int → double; float → double;
  *   decimal(p,s) → decimal(p',s') when s' ≥ s and p'−s' ≥ p−s.
  * long→double is refused (loses precision past 2^53), as is any
  * narrowing or cross-family change.
  *
  * One index caveat handled by callers: a per-file BLOOM sidecar hashes
  * values in their build-time declared type, and xxhash64(int) ≠
  * xxhash64(long) — widening a bloomed column invalidates its filters
  * (kept filters would false-SKIP files, a wrong answer). Stats sidecars
  * store double embeddings and survive widening unchanged.
  */
object Widen {

  /** Can a column declared `from` be read losslessly as `to`? */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      d2.scale >= d1.scale && d2.precision - d2.scale >= d1.precision - d1.scale
    case _ => false
  }

  /** The common wider type of two declarations, if one subsumes the other. */
  def widen(a: DataType, b: DataType): Option[DataType] =
    if (canWiden(a, b)) Some(b)
    else if (canWiden(b, a)) Some(a)
    else None

  /** Widen `recorded` against an incoming schema: common columns may
    * promote (either direction — a narrower incoming column upcasts on
    * read, a wider one widens the record), `extraOk` appends incoming
    * columns the record lacks, and anything non-promotable throws.
    * Partition columns never change type (their dir-value parses and
    * transform expressions are pinned to the declared type).
    * Returns (widened schema, names of widened recorded columns).
    */
  def widenSchema(recorded: StructType, incoming: StructType,
                  partitions: Seq[String],
                  extraOk: Boolean = true): (StructType, Seq[String]) = {
    val in = incoming.fields.map(f => f.name -> f.dataType).toMap
    val widenedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    val fields = recorded.fields.map { f =>
      in.get(f.name) match {
        case Some(dt) if dt == f.dataType => f
        case Some(dt) =>
          val w = widen(f.dataType, dt).getOrElse(throw new IllegalArgumentException(
            s"column ${f.name}: incoming type $dt is not a lossless widening of " +
              s"the dataset's ${f.dataType} (and not narrower than it) — " +
              "narrowing/cross-family changes need a republish"))
          require(!partitions.contains(f.name),
            s"partition column ${f.name} cannot change type (${f.dataType} -> $dt)")
          if (w != f.dataType) widenedNames += f.name
          f.copy(dataType = w)
        case None => f
      }
    }
    val extra = incoming.fields.filterNot(f => recorded.fieldNames.contains(f.name))
    require(extra.isEmpty || extraOk,
      s"incoming schema carries new columns ${extra.map(_.name).mkString(",")}")
    (StructType(fields ++ extra.map(_.copy(nullable = true))), widenedNames.toSeq)
  }
}
