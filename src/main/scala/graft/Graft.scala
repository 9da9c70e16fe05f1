package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{ColFilter, Fetch, Publish}

/** One-object facade mirroring the reference's public import surface
  * (s3parq/__init__.py): a user of the reference switches by replacing
  * `import s3parq as parq` with `import graft.Graft` and a (bucket, key)
  * pair with a dataset root path. See README.md for the full mapping.
  */
object Graft {

  def publish(spark: SparkSession, df: DataFrame, root: String,
              partitions: Seq[String], mode: String = "overwrite"): Seq[String] =
    Publish.publish(spark, df, root, partitions, mode)

  def customPublish(spark: SparkSession, df: DataFrame, root: String,
                    partitions: Seq[String], customColumns: Map[String, String]): Seq[String] =
    Publish.customPublish(spark, df, root, partitions, customColumns)

  def fetch(spark: SparkSession, root: String, filters: Seq[ColFilter] = Nil,
            acceptNotGraft: Boolean = true): DataFrame =
    Fetch.fetch(spark, root, filters, acceptNotGraft)

  def fetchDiff(spark: SparkSession, inputRoot: String, comparisonRoot: String,
                partition: String, reverse: Boolean = false): DataFrame =
    Fetch.fetchDiff(spark, inputRoot, comparisonRoot, partition, reverse)

  def getAllPartitionValues(spark: SparkSession, root: String, partition: String): Seq[Any] =
    Fetch.getAllPartitionValues(spark, root, partition)

  def getDiffPartitionValues(spark: SparkSession, root: String, partition: String,
                             valuesToDiff: Seq[Any], reverse: Boolean = false): Seq[Any] =
    Fetch.getDiffPartitionValues(spark, root, partition, valuesToDiff, reverse)

  def getMaxPartitionValue(spark: SparkSession, root: String, partition: String): Option[Any] =
    Fetch.getMaxPartitionValue(spark, root, partition)

  def getAllFilesList(spark: SparkSession, root: String): Seq[String] =
    Fetch.allFiles(spark, root)
}
