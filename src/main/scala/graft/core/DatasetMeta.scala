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
final case class DatasetMeta(schema: StructType, partitions: Seq[String]) {
  require(partitions.forall(schema.fieldNames.contains),
    s"partition columns ${partitions.mkString(",")} must exist in the schema")

  def partitionType(p: String): DataType = schema(p).dataType
  def partitionTypes: Map[String, DataType] =
    partitions.map(p => p -> partitionType(p)).toMap
  def dataColumns: Seq[String] =
    schema.fieldNames.toSeq.filterNot(partitions.contains)
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
    if (!fs.exists(p)) None
    else {
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
      Some(DatasetMeta(schema, parts))
    }
  }
}
