package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Publish, Versions}

/** Rewrite a commit entry's raw JSON in place for timestamp tests. The
  * local filesystem keeps `.crc` checksum sidecars; an edited entry must
  * drop its sidecar or every later read fails the checksum.
  */
private[graft] object EntryEdit {
  def rewrite(root: String, v: Int, f: String => String): Unit = {
    val p = Paths.get(root, "_graft_versions", "v%08d.json".format(v))
    Files.writeString(p, f(Files.readString(p)))
    val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
    Files.deleteIfExists(crc)
  }

  /** Pin version `v`'s in-commit timestamp to `ts`. */
  def setTs(root: String, v: Int, ts: Long): Unit =
    rewrite(root, v, _.replaceAll(""""ts":\d+""", s""""ts":$ts"""))
}

/** In-commit timestamps (the Delta ICT design): the commit instant rides
  * the entry bytes, is monotonic by construction (parent+1ms clamp), and
  * TIMESTAMP AS OF resolves from it — never from file mtimes, which clock
  * skew, copied logs, or store migrations can scramble. Pre-ICT entries
  * (no `ts` field) fall back to mtime.
  */
class InCommitTsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def threeCommits(): String = {
    val root = TestSpark.tmpDir("ict")
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "v"), root, Nil)
    Publish.publishVersioned(spark, Seq((2L, "b")).toDF("id", "v"), root, Nil,
      mode = "append")
    Publish.publishVersioned(spark, Seq((3L, "c")).toDF("id", "v"), root, Nil,
      mode = "append")
    root
  }

  private def entryFile(root: String, v: Int) =
    Paths.get(root, "_graft_versions", f"v$v%08d.json")

  test("every commit carries a strictly increasing in-commit ts") {
    val root = threeCommits()
    val ts = (1 to 3).map(v => Versions.readEntry(spark, root, v).ts)
    assert(ts.forall(_.isDefined), s"missing in-commit ts: $ts")
    assert(ts.flatten == ts.flatten.sorted && ts.flatten.distinct == ts.flatten,
      s"in-commit timestamps not strictly increasing: $ts")
    // history surfaces the instant
    val h = Versions.history(spark, root).orderBy("version")
      .select("ts_millis").as[Long].collect()
    assert(h.toSeq == ts.flatten)
  }

  test("a future-stamped parent clamps the next commit past it (monotonic by construction)") {
    val root = threeCommits()
    // plant a parent entry stamped one hour in the future (a committer
    // with a fast clock) — the next commit must still land AFTER it
    val future = System.currentTimeMillis() + 3600L * 1000
    EntryEdit.setTs(root, 3, future)
    Publish.publishVersioned(spark, Seq((4L, "d")).toDF("id", "v"), root, Nil,
      mode = "append")
    val ts4 = Versions.readEntry(spark, root, 4).ts.get
    assert(ts4 > future, s"commit 4 stamped $ts4, not past the fast parent $future")
  }

  test("TIMESTAMP AS OF resolves from in-commit ts even under scrambled mtimes") {
    val root = threeCommits()
    val ts = (1 to 3).map(v => Versions.readEntry(spark, root, v).ts.get)
    // scramble the entry files' mtimes into reverse order (copied log /
    // skewed store): resolution must not notice
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    (1 to 3).foreach { v =>
      f.setTimes(new org.apache.hadoop.fs.Path(entryFile(root, v).toString),
        ts(3 - v) + 999999L, -1)
    }
    assert(Versions.versionAsOf(spark, root, ts(1)) == 2)
    assert(Versions.versionAsOf(spark, root, ts(2)) == 3)
    assert(Versions.versionAsOf(spark, root, ts(0)) == 1)
    intercept[IllegalArgumentException] {
      Versions.versionAsOf(spark, root, ts(0) - 10L)
    }
    // and the content follows the resolved version
    assert(Versions.fetchAsOf(spark, root, ts(1)).count() == 2)
  }

  test("protocol gate: entries stamping unknown log features refuse loudly") {
    val root = threeCommits()
    // a feature-bearing entry from a current writer reads fine
    graft.core.Mutations.deleteWhereDv(spark,
      root, org.apache.spark.sql.functions.col("id") === 1L)
    val e4 = Versions.readEntry(spark, root, 4)
    assert(e4.dvs.nonEmpty)
    // plant a FUTURE feature on the newest entry: every read surface
    // must refuse with upgrade guidance, not misread
    EntryEdit.rewrite(root, 4,
      _.replace(""""features":["dv"]""", """"features":["dv","v9_row_ids"]"""))
    val e = intercept[UnsupportedOperationException] {
      Versions.readEntry(spark, root, 4)
    }
    assert(e.getMessage.contains("v9_row_ids") && e.getMessage.contains("upgrade"))
    intercept[UnsupportedOperationException] {
      graft.core.Fetch.fetch(spark, root).collect()
    }
    // versions BEFORE the futuristic entry stay readable
    assert(Versions.fetchVersion(spark, root, 3).count() == 3)
  }

  test("pre-ICT entries (no ts field) fall back to entry mtime") {
    val root = threeCommits()
    (1 to 3).foreach { v =>
      EntryEdit.rewrite(root, v, _.replaceAll(""","ts":\d+""", ""))
      assert(Versions.readEntry(spark, root, v).ts.isEmpty)
    }
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L
    (1 to 3).foreach { v =>
      f.setTimes(new org.apache.hadoop.fs.Path(entryFile(root, v).toString),
        base + v * 1000L, -1)
    }
    assert(Versions.versionAsOf(spark, root, base + 2500L) == 2)
    assert(Versions.entryTimestamp(spark, root, 1) == base + 1000L)
  }
}
