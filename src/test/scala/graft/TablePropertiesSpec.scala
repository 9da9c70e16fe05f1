package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish, Versions}

/** Table properties (TBLPROPERTIES in the commit log) and the opt-in
  * auto-compaction policy they drive.
  */
class TablePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String = {
    val root = TestSpark.tmpDir("tblprops")
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "v"), root, Nil)
    root
  }

  test("set/unset round-trip; properties persist across overwrite and append") {
    val root = fresh()
    Versions.setTableProperties(spark, root,
      Map("owner" -> "data-eng", "graft.autoCompact.minSmallFiles" -> "100"))
    assert(Versions.tablePropertiesOf(spark, root) ==
      Map("owner" -> "data-eng", "graft.autoCompact.minSmallFiles" -> "100"))
    // survive a logical overwrite AND an append
    Publish.publishVersioned(spark, Seq((2L, "b")).toDF("id", "v"), root, Nil)
    Publish.publishVersioned(spark, Seq((3L, "c")).toDF("id", "v"), root, Nil,
      mode = "append")
    assert(Versions.tablePropertiesOf(spark, root)("owner") == "data-eng")
    Versions.unsetTableProperties(spark, root, Seq("owner", "never_set"))
    assert(Versions.tablePropertiesOf(spark, root) ==
      Map("graft.autoCompact.minSmallFiles" -> "100"))
    // time travel: the pre-SET version carries no properties
    assert(Versions.readEntry(spark, root, 1).properties.isEmpty)
  }

  test("SQL verbs: SET/UNSET/SHOW TBLPROPERTIES") {
    val root = fresh()
    spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES " +
      "('a.b'='1', 'team'='curation')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$root`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("a.b" -> "1", "team" -> "curation"))
    spark.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES ('a.b')")
    assert(Versions.tablePropertiesOf(spark, root) == Map("team" -> "curation"))
  }

  test("auto-compaction: threshold crossing bin-packs the small tail, once") {
    val root = TestSpark.tmpDir("autocompact")
    Publish.publishVersioned(spark,
      (0 until 50).map(i => (i.toLong, "x" * 10)).toDF("id", "v"), root, Nil)
    Versions.setTableProperties(spark, root,
      Map("graft.autoCompact.minSmallFiles" -> "4",
        "graft.autoCompact.smallBytes" -> (1L << 20).toString))
    // three appends: after the third the live small-file count crosses 4
    // and the append itself triggers ONE rewrite commit
    (1 to 3).foreach { i =>
      Publish.publishVersioned(spark,
        Seq((100L + i, "y")).toDF("id", "v"), root, Nil, mode = "append")
    }
    val h = Versions.history(spark, root).orderBy("version")
      .select("action").as[String].collect().toSeq
    assert(h.count(_ == "rewrite") == 1,
      s"expected exactly one auto-compaction rewrite, history: $h")
    // content unchanged, file count collapsed
    assert(Fetch.fetch(spark, root).count() == 53)
    val latest = Versions.latestVersion(spark, root).get
    val (files, _, _) = Versions.snapshotFullAt(spark, root, latest)
    assert(files.size < 5, s"auto-compaction left ${files.size} live files")
    // no property → later appends never compact
    Versions.unsetTableProperties(spark, root, Seq("graft.autoCompact.minSmallFiles"))
    Publish.publishVersioned(spark, Seq((200L, "z")).toDF("id", "v"), root, Nil,
      mode = "append")
    val h2 = Versions.history(spark, root).select("action").as[String].collect()
    assert(h2.count(_ == "rewrite") == 1)
  }
}
