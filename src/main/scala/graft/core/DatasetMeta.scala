package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Logical metadata for a graft dataset: the original schema (column order and
  * exact Spark types, partition columns included) plus which columns the
  * dataset is partitioned by.
  *
  * Spark-native equivalent of the reference's per-object
  * `partition_data_types` S3 metadata (s3parq publish_parq.py:211,
  * fetch_parq.py:357): hive-style directory names erase partition types
  * (bool/long/timestamp come back as strings or narrowed ints), so publish
  * records them once in a tiny `_graft_meta.json` sidecar at the dataset root
  * — one object instead of one metadata stamp per data file, so reading it
  * back is O(1) regardless of dataset size.
  */
/** `colMap`: logical→physical column-name mapping in force for this
  * snapshot's files ([[VersionEntry.colMap]] — versioned datasets only;
  * empty = identity). Carried here so every read path that already
  * receives a DatasetMeta can scan under physical names and restore the
  * logical ones. NOT serialized to the sidecar: the commit entries own
  * it (the sidecar always records the current LOGICAL schema).
  */
final case class DatasetMeta(schema: StructType, partitions: Seq[String],
                             colMap: Map[String, String] = Map.empty) {
  require(partitions.forall(schema.fieldNames.contains),
    s"partition columns ${partitions.mkString(",")} must exist in the schema")
  require(colMap.keySet.subsetOf(schema.fieldNames.toSet),
    s"colMap names columns not in the schema: ${colMap.keySet -- schema.fieldNames}")
  require(schema.fieldNames.map(n => colMap.getOrElse(n, n)).distinct.length ==
      schema.fields.length,
    "colMap collapses two logical columns onto one physical name")

  def partitionType(p: String): DataType = schema(p).dataType
  def partitionTypes: Map[String, DataType] =
    partitions.map(p => p -> partitionType(p)).toMap
  def dataColumns: Seq[String] =
    schema.fieldNames.toSeq.filterNot(partitions.contains)

  /** The physical (on-file) name of a logical column. */
  def physName(logical: String): String = colMap.getOrElse(logical, logical)

  /** The schema as the data files carry it (physical names, same types
    * and order) — what a scan must be given.
    */
  def physSchema: StructType =
    if (colMap.isEmpty) schema
    else StructType(schema.fields.map(f => f.copy(name = physName(f.name))))
}

object DatasetMeta {
  val FileName = "_graft_meta.json"

  private def fsPath(root: String) = new Path(root, FileName)

  def write(spark: SparkSession, root: String, meta: DatasetMeta): Unit = {
    val json = JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JInt(1),
      "partitions" -> JArray(meta.partitions.map(JString(_)).toList),
      "schema" -> JsonMethods.parse(meta.schema.json)
    )))
    val p = fsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, root: String): Option[DatasetMeta] = {
    val p = fsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The sidecar is rewritten in place (plain overwrite, no atomic
    // rename on every store), so a reader racing a writer — lock-free
    // OCC mutations both republish it — can observe an EMPTY or partial
    // file for the milliseconds between create(overwrite) and close.
    // Same remedy as Versions.readEntry: that is a write IN FLIGHT, not
    // corruption — retry briefly, then surface the real error.
    val deadline = System.currentTimeMillis() + 1000
    var lastErr: Throwable = null
    while (System.currentTimeMillis() <= deadline) {
      if (!fs.exists(p)) return None
      try {
        val in = fs.open(p)
        val raw = try {
          val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          in.readFully(bytes)
          new String(bytes, "UTF-8")
        } finally in.close()
        val jv = JsonMethods.parse(raw)
        val parts = (jv \ "partitions") match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case _ => Nil
        }
        val schema = DataType.fromJson(
          JsonMethods.compact(JsonMethods.render(jv \ "schema"))).asInstanceOf[StructType]
        return Some(DatasetMeta(schema, parts))
      } catch {
        case scala.util.control.NonFatal(e) => lastErr = e; Thread.sleep(20)
      }
    }
    throw new IllegalStateException(
      s"$p is unreadable after retries — a writer crashed mid-rewrite?", lastErr)
  }
}
