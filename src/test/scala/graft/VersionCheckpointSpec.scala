package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Mutations, Publish, Versions}

/** Persisted commit-log checkpoints: every `spark.graft.checkpoint.interval`
  * commits (default 10) the committer writes `_graft_versions/cNNNNNNNN.json`
  * holding the resolved live file set + DV refs, witness-pinned to the raw
  * bytes of its version's entry. A FRESH PROCESS resolving a long append
  * chain seeds its replay from the newest checkpoint at or below the target
  * instead of walking every entry — O(interval) metadata reads cross-process
  * where the in-JVM memo only helped within one driver (the Delta
  * checkpoint design re-expressed over graft's one-JSON-per-commit log).
  */
class VersionCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reads(body: => Unit): Long = {
    val before = Versions.entryReads.get(); body
    Versions.entryReads.get() - before
  }

  private def appendChain(root: String, n: Int): Unit = {
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "grp"),
      root, Seq("grp"))
    (2 to n).foreach(i => Publish.publishVersioned(spark,
      Seq((i.toLong, "a")).toDF("id", "grp"), root, Seq("grp"), mode = "append"))
  }

  test("a fresh process resolves a long chain from the checkpoint, not a full replay") {
    val root = TestSpark.tmpDir("ckpt_chain")
    appendChain(root, 25) // checkpoints auto-written at v10 and v20
    val dir = new java.io.File(root, "_graft_versions")
    assert(dir.list().count(_.startsWith("c")) == 2)
    // simulate a fresh JVM: the in-memory memo is gone, only disk remains
    Versions.clearSnapshotMemo()
    // resolving v25 walks 25..21, seeds from the v20 checkpoint (1 witness
    // read) — strictly less than the 25-entry replay
    val n = reads {
      assert(Versions.fetchVersion(spark, root, 25).select("id")
        .as[Long].collect().sorted.toSeq == (1L to 25L))
    }
    assert(n <= 8, s"expected checkpoint-seeded replay (<=8 entry reads), got $n")
    // a checkpoint AT the target version answers outright
    Versions.clearSnapshotMemo()
    val n20 = reads { assert(Versions.snapshotAt(spark, root, 20)._1.size == 20) }
    assert(n20 <= 2, s"expected direct checkpoint hit (<=2 entry reads), got $n20")
  }

  test("checkpoints carry deletion vectors") {
    val root = TestSpark.tmpDir("ckpt_dv")
    appendChain(root, 9)
    Mutations.deleteWhereDv(spark, root, col("id") <= 3) // v10 -> checkpointed
    assert(new java.io.File(root, "_graft_versions")
      .list().exists(_.startsWith("c00000010")))
    Versions.clearSnapshotMemo()
    assert(Fetch.fetch(spark, root).select("id").as[Long].collect().sorted.toSeq
      == (4L to 9L))
  }

  test("a stale checkpoint from a re-created dataset is ignored (witness mismatch)") {
    val root = TestSpark.tmpDir("ckpt_stale")
    appendChain(root, 10)
    val ckpt = new java.io.File(root, "_graft_versions/c00000010.json")
    assert(ckpt.exists)
    val staleBytes = java.nio.file.Files.readAllBytes(ckpt.toPath)
    // re-create the dataset at the same path with different content
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    Publish.publishVersioned(spark, Seq((101L, "z")).toDF("id", "grp"),
      root, Seq("grp"))
    (2 to 10).foreach(i => Publish.publishVersioned(spark,
      Seq((100L + i, "z")).toDF("id", "grp"), root, Seq("grp"), mode = "append"))
    // plant the OLD checkpoint over the new dataset's: same version number,
    // different chain — the witness (raw entry bytes) must reject it
    java.nio.file.Files.write(ckpt.toPath, staleBytes)
    Versions.clearSnapshotMemo()
    assert(Versions.fetchVersion(spark, root, 10).select("id")
      .as[Long].collect().sorted.toSeq == (101L to 110L))
  }

  test("interval is configurable and 0 disables; explicit writeCheckpoint works") {
    val root = TestSpark.tmpDir("ckpt_interval")
    spark.conf.set("spark.graft.checkpoint.interval", "0")
    try {
      appendChain(root, 12)
      val dir = new java.io.File(root, "_graft_versions")
      assert(!dir.list().exists(_.startsWith("c")))
      // maintenance jobs can force one at any version
      Versions.writeCheckpoint(spark, root, 12)
      assert(dir.list().exists(_.startsWith("c00000012")))
      Versions.clearSnapshotMemo()
      val n = reads { assert(Versions.snapshotAt(spark, root, 12)._1.size == 12) }
      assert(n <= 2, s"expected direct checkpoint hit, got $n entry reads")
    } finally spark.conf.unset("spark.graft.checkpoint.interval")
  }
}
