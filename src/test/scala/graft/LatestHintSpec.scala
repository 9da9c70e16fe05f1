package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DatasetMeta, Versions}

/** The `_latest` pointer makes version resolution O(1) in the log size
  * (r16/r17 verdict item): latestVersion reads one hint file + a bounded
  * forward probe instead of listing the whole log directory, and a cold
  * snapshot resolve on a long chain pays O(checkpoint interval) entry
  * reads and ZERO directory listings — independent of commit count.
  */
class LatestHintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = Seq((1L, "a")).toDF("id", "grp").schema
  private val meta = DatasetMeta(schema, Nil)

  /** A long chain of pure-metadata commits (no data files — entry writes
    * only), cheap enough to build hundreds of versions in a spec.
    */
  private def chain(root: String, n: Int): Unit = {
    Versions.commit(spark, root, "overwrite", Nil, meta)
    (2 to n).foreach(_ => Versions.commit(spark, root, "append", Nil, meta))
  }

  private def counting(body: => Unit): (Long, Long) = {
    val r0 = Versions.entryReads.get(); val l0 = Versions.logListings.get()
    body
    (Versions.entryReads.get() - r0, Versions.logListings.get() - l0)
  }

  test("cold resolve of a 500-commit chain is O(interval), with no log listing") {
    val root = TestSpark.tmpDir("hint_chain")
    chain(root, 500)
    Versions.clearSnapshotMemo()
    val (reads, listings) = counting {
      assert(Versions.snapshotAt(spark, root, 500)._1.isEmpty)
    }
    assert(listings == 0, s"hinted resolve must not list the log dir, did $listings times")
    // walk: target entry + <= interval entries back to the nearest
    // checkpoint + its witness read + slack for the vacuum/hint probes
    assert(reads <= 16, s"expected bounded entry reads on a 500-commit chain, got $reads")
  }

  test("latestVersion probes forward past a stale hint and repairs a missing one") {
    val root = TestSpark.tmpDir("hint_stale")
    chain(root, 30)
    val hint = new java.io.File(root, "_graft_versions/_latest")
    // stale-low hint (a crashed writer): forward probe must still find 30
    java.nio.file.Files.write(hint.toPath, "25".getBytes)
    assert(Versions.latestVersion(spark, root).contains(30))
    // garbage hint: falls back to one listing and repairs the hint
    java.nio.file.Files.write(hint.toPath, "not-a-number".getBytes)
    val (_, l1) = counting { assert(Versions.latestVersion(spark, root).contains(30)) }
    assert(l1 == 1)
    assert(new String(java.nio.file.Files.readAllBytes(hint.toPath)) == "30")
    // missing hint (legacy log): same one-listing repair, then O(1) again
    assert(hint.delete())
    val (_, l2) = counting { assert(Versions.latestVersion(spark, root).contains(30)) }
    assert(l2 == 1)
    val (_, l3) = counting { assert(Versions.latestVersion(spark, root).contains(30)) }
    assert(l3 == 0, "repaired hint must serve the next call without listing")
  }
}
