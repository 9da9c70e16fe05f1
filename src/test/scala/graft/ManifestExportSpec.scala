package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Mutations, Publish, Versions}
import graft.plans.GraftSql

/** Symlink-format-manifest export: external engines must see the EXACT
  * snapshot — per-partition manifests of live file URIs, ghosts invisible,
  * full-replace regeneration, refusal while deletion vectors are live.
  */
class ManifestExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def manifestLines(root: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root, Versions.SymlinkManifestDir)
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(p => p.getFileName.toString == "manifest")
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .toSeq
  }

  private def readViaManifest(root: String) =
    spark.read.parquet(manifestLines(root): _*)

  test("manifest lists exactly the live snapshot; ghosts invisible") {
    val root = TestSpark.tmpDir("manifest_basic")
    val df = (0 until 100).map(i => (i.toLong, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v")
    Publish.publishVersioned(spark, df, root, Seq("grp"))
    // logical overwrite keeps v1's files on disk (ghosts for time travel)
    Publish.publishVersioned(spark, df.where(col("id") < 40), root, Seq("grp"))
    val manifests = Versions.writeSymlinkManifest(spark, root)
    assert(manifests.size == 4, "one manifest per live partition dir")
    val viaManifest = readViaManifest(root).select("id").as[Long].collect().sorted
    assert(viaManifest.toSeq == (0L until 40L), "external read = exact snapshot")
    // every line is a fully-qualified URI of an existing file
    assert(manifestLines(root).forall(l => l.startsWith("file:") && l.endsWith(".parquet")))
  }

  test("regeneration is full-replace: stale partition manifests go away") {
    val root = TestSpark.tmpDir("manifest_regen")
    val df = (0 until 100).map(i => (i.toLong, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v")
    Publish.publishVersioned(spark, df, root, Seq("grp"))
    Versions.writeSymlinkManifest(spark, root)
    // overwrite with a snapshot that drops partitions g2/g3 entirely
    Publish.publishVersioned(spark, df.where(col("id") % 4 < 2), root, Seq("grp"))
    val manifests = Versions.writeSymlinkManifest(spark, root)
    assert(manifests.size == 2)
    assert(readViaManifest(root).count() == 50)
  }

  test("refuses while deletion vectors are live; exports after OPTIMIZE") {
    val root = TestSpark.tmpDir("manifest_dv")
    Publish.publishVersioned(spark,
      (0 until 50).map(i => (i.toLong, "g0", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    Mutations.deleteWhereDv(spark, root, col("id") % 5 === 0)
    val ex = intercept[IllegalArgumentException] {
      Versions.writeSymlinkManifest(spark, root)
    }
    assert(ex.getMessage.contains("deletion vectors"))
    Versions.compact(spark, root) // materializes the deletes
    Versions.writeSymlinkManifest(spark, root)
    assert(readViaManifest(root).count() == 40)
  }

  test("version pinning and the SQL verb; unpartitioned single manifest") {
    val root = TestSpark.tmpDir("manifest_sql")
    val df = (0 until 60).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    Publish.publishVersioned(spark, df, root, Nil)
    Publish.publishVersioned(spark, df.where(col("id") < 10), root, Nil)
    val out = GraftSql.exec(spark,
      s"GENERATE symlink_format_manifest FOR TABLE graft.`$root` VERSION AS OF 1")
      .collect()
    assert(out.length == 1, "unpartitioned data gets ONE top-level manifest")
    assert(readViaManifest(root).count() == 60, "pinned to v1")
  }

  test("clone-inherited external refs export their absolute source URIs") {
    val src = TestSpark.tmpDir("manifest_clone_src")
    Publish.publishVersioned(spark,
      (0 until 30).map(i => (i.toLong, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "v"),
      src, Seq("grp"))
    val dst = TestSpark.tmpDir("manifest_clone_dst")
    Versions.clone(spark, src, dst)
    Versions.writeSymlinkManifest(spark, dst)
    val lines = manifestLines(dst)
    val srcName = new org.apache.hadoop.fs.Path(src).getName
    assert(lines.nonEmpty && lines.forall(_.contains(srcName)),
      "manifest points at the source's files")
    assert(readViaManifest(dst).count() == 30)
  }
}
