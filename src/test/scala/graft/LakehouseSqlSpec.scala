package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish, Versions}
import graft.plans.GraftSql

/** The SQL statement surface over graft roots: reads (snapshot + time
  * travel), mutations (DELETE / UPDATE / MERGE), the rejected shapes, and
  * both entry points — `spark.sql` (TestSpark carries the extension) and
  * [[GraftSql.exec]] (extension-less sessions).
  */
class LakehouseSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTarget(): String = {
    val root = TestSpark.tmpDir("lakehouse_sql")
    Publish.publishVersioned(spark,
      (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 10.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    root
  }

  test("SELECT reads the latest snapshot; VERSION/TIMESTAMP AS OF time-travel") {
    val root = freshTarget()
    Publish.publishVersioned(spark,
      (100 until 110).map(i => (i.toLong, "g0", i * 10.0)).toDF("id", "grp", "v"),
      root, Seq("grp"), mode = "append")
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 70)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 1")
      .head().getLong(0) == 60)
    assert(spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 2").count() == 70)
    // a far-future timestamp sees the latest version
    assert(spark.sql(
      s"SELECT * FROM graft.`$root` TIMESTAMP AS OF '2099-01-01 00:00:00'").count() == 70)
    // aggregation + filter compose over the substituted snapshot plan
    val agg = spark.sql(
      s"SELECT grp, count(*) AS n FROM graft.`$root` WHERE id < 30 GROUP BY grp ORDER BY grp")
      .as[(String, Long)].collect().toSeq
    assert(agg == Seq(("g0", 10L), ("g1", 10L), ("g2", 10L)))
  }

  test("DELETE / UPDATE / MERGE INTO mutate through spark.sql") {
    val root = freshTarget()
    val del = spark.sql(s"DELETE FROM graft.`$root` WHERE grp = 'g1' AND id < 30")
    assert(del.columns.toSeq == Seq("version", "removed_files", "added_files"))
    assert(del.head().getInt(0) == 2)
    assert(Fetch.fetch(spark, root).count() == 50)

    spark.sql(s"UPDATE graft.`$root` SET v = v + 0.5 WHERE id % 10 = 0")
    val got = Fetch.fetch(spark, root).select("id", "v").as[(Long, Double)]
      .collect().toMap
    assert(got(20L) == 200.5 && got(21L) == 210.0)

    (0 until 60 by 20).map(i => (i.toLong, s"g${i % 3}", -1.0)).toDF("id", "grp", "v")
      .unionByName(Seq((1000L, "g0", 7.0)).toDF("id", "grp", "v"))
      .createOrReplaceTempView("lakehouse_sql_src")
    spark.sql(s"MERGE INTO graft.`$root` t USING lakehouse_sql_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val after = Fetch.fetch(spark, root).select("id", "v").as[(Long, Double)]
      .collect().toMap
    assert(after(0L) == -1.0 && after(40L) == -1.0 && after(1000L) == 7.0)
    assert(after.size == 51)
    // time travel still sees v1 untouched
    assert(Versions.fetchVersion(spark, root, 1).count() == 60)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns via SQL") {
    val root = freshTarget()
    Seq((0L, "g0", -1.0, "tagged"), (2000L, "g1", 9.0, "new"))
      .toDF("id", "grp", "v", "tag")
      .createOrReplaceTempView("lakehouse_sql_evo_src")
    spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t " +
      "USING lakehouse_sql_evo_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val out = Fetch.fetch(spark, root)
    assert(out.columns.toSeq == Seq("id", "grp", "v", "tag"))
    val tags = out.select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(tags(0L).contains("tagged") && tags(2000L).contains("new"))
    assert(tags(1L).isEmpty)
    // DV mode rejects evolution instead of silently dropping the column
    spark.conf.set("spark.graft.merge.mode", "dv")
    try {
      val e = intercept[IllegalArgumentException] {
        spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t " +
          "USING lakehouse_sql_evo_src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      }
      assert(e.getMessage.contains("SCHEMA EVOLUTION"))
    } finally spark.conf.unset("spark.graft.merge.mode")
  }

  test("GraftSql.exec runs the identical conversion without the extension") {
    val root = freshTarget()
    assert(GraftSql.exec(spark, s"SELECT * FROM graft.`$root`").count() == 60)
    GraftSql.exec(spark, s"DELETE FROM graft.`$root` WHERE id >= 50")
    assert(GraftSql.exec(spark, s"SELECT max(id) AS m FROM graft.`$root`")
      .head().getLong(0) == 49L)
    // non-graft statements pass through untouched
    assert(GraftSql.exec(spark, "SELECT 1 AS one").head().getInt(0) == 1)
  }

  test("unsupported shapes are rejected loudly, never approximated") {
    val root = freshTarget()
    Seq((1L, "g0", 0.0)).toDF("id", "grp", "v")
      .createOrReplaceTempView("lakehouse_sql_src")
    val del = intercept[UnsupportedOperationException] {
      spark.sql(s"MERGE INTO graft.`$root` t USING lakehouse_sql_src s " +
        "ON t.id = s.id WHEN MATCHED THEN DELETE")
    }
    assert(del.getMessage.contains("upsert form"))
    val keys = intercept[UnsupportedOperationException] {
      spark.sql(s"MERGE INTO graft.`$root` t USING lakehouse_sql_src s " +
        "ON t.id = s.v WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(keys.getMessage.contains("equi-key"))
    val ts = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM graft.`$root` TIMESTAMP AS OF rand()").collect()
    }
    assert(ts.getMessage.contains("literal"))
    // mutations on an unversioned root surface Mutations' own guard
    val plain = TestSpark.tmpDir("lakehouse_sql_plain")
    Publish.publish(spark, Seq((1L, 1.0)).toDF("id", "v"), plain, Nil)
    val unv = intercept[IllegalArgumentException] {
      spark.sql(s"DELETE FROM graft.`$plain` WHERE id = 1")
    }
    assert(unv.getMessage.contains("versioned"))
    // reads of an unversioned root still work (plain fetch)
    assert(spark.sql(s"SELECT * FROM graft.`$plain`").count() == 1)
  }

  test("maintenance statements: OPTIMIZE / RESTORE / VACUUM / DESCRIBE HISTORY") {
    val root = freshTarget()
    (0 until 3).foreach(i => Publish.publishVersioned(spark,
      Seq((100L + i, "g0", 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"), mode = "append"))
    val frag = Publish.listDataFiles(spark, root).size
    val opt = spark.sql(s"OPTIMIZE graft.`$root`").head()
    assert(opt.getInt(0) == 5) // v5 = the compaction overwrite
    assert(Publish.listDataFiles(spark, root).size < frag)
    assert(Fetch.fetch(spark, root).count() == 63)
    // a bad overwrite, rolled back metadata-only
    Publish.publishVersioned(spark, Seq((999L, "g0", 0.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    val rst = spark.sql(s"RESTORE graft.`$root` TO VERSION AS OF 5").head()
    assert((rst.getInt(0), rst.getInt(1)) == ((5, 7)))
    assert(Fetch.fetch(spark, root).count() == 63)
    // vacuum keeps only versions the newest 1 references: v5's files
    // survive (v7 restored them), the fragments and the bad overwrite die
    val vac = spark.sql(s"VACUUM graft.`$root` RETAIN 1 VERSIONS GRACE 0 MINUTES").head()
    assert(vac.getInt(0) == 7)
    assert(vac.getInt(1) > 0)
    assert(Fetch.fetch(spark, root).count() == 63)
    intercept[IllegalArgumentException] { Versions.fetchVersion(spark, root, 6) }
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$root`")
      .select("version", "action").as[(Int, String)].collect().toSeq
    assert(hist == Seq(1 -> "overwrite", 2 -> "append", 3 -> "append",
      4 -> "append", 5 -> "overwrite", 6 -> "overwrite", 7 -> "overwrite"))
    // ZORDER arm + GraftSql.exec parity (extension-less path)
    val z = GraftSql.exec(spark, s"OPTIMIZE graft.`$root` ZORDER BY (id, v)").head()
    assert(z.getInt(0) == 8)
    assert(Fetch.fetch(spark, root).count() == 63)
    // a defaulted-horizon VACUUM is NOT grammar — Spark's parser rejects
    intercept[Exception] { spark.sql(s"VACUUM graft.`$root`") }
    // non-graft statements never match the maintenance shapes
    intercept[Exception] { spark.sql("OPTIMIZE some_table") }
  }

  test("DESCRIBE DETAIL / RESTORE TO TIMESTAMP / VACUUM DRY RUN") {
    val root = TestSpark.tmpDir("sql_ops")
    Publish.publishVersioned(spark,
      (0 until 40).map(i => (i.toLong, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    val t1 = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    Publish.publishVersioned(spark,
      (100 until 110).map(i => (i.toLong, "g0", -1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"), mode = "append")
    val d = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head()
    assert(d.getString(0) == "graft")
    assert(d.getLong(1) > 0 && d.getLong(2) > 0)
    assert(d.getString(3) == "grp")
    assert(d.getInt(4) == 2 && d.getInt(5) == 1 && d.getInt(6) == 0)
    // DRY RUN after a logical overwrite: lists the ghosts, deletes nothing
    Publish.publishVersioned(spark,
      (200 until 205).map(i => (i.toLong, "g1", 2.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))                                              // v3
    val wouldGo = spark.sql(
      s"VACUUM graft.`$root` RETAIN 1 VERSIONS GRACE 0 MINUTES DRY RUN")
      .as[String].collect().toSeq
    assert(wouldGo.nonEmpty)
    assert(Fetch.fetch(spark, root).count() == 5)
    assert(Versions.fetchVersion(spark, root, 1).count() == 40, "dry run must not delete")
    assert(Versions.minReadableVersion(spark, root) == 1, "dry run must not advance the watermark")
    // timestamp restore: back to the version in force at t1 (v1)
    val r = GraftSql.exec(spark, s"RESTORE graft.`$root` TO TIMESTAMP AS OF '$t1'").head()
    assert(r.getInt(0) == 1)
    assert(Fetch.fetch(spark, root).count() == 40)
    // tolerant literal forms: the ISO 'T' separator restores identically,
    // and a date-only literal parses to session-zone midnight
    val iso = t1.toString.replace(' ', 'T')
    val r2 = GraftSql.exec(spark,
      s"RESTORE graft.`$root` TO TIMESTAMP AS OF '$iso'").head()
    assert(r2.getInt(0) == 1)
    assert(Versions.parseTsLiteral(spark, "2001-02-03") ==
      java.time.LocalDate.parse("2001-02-03")
        .atStartOfDay(java.time.ZoneId.of("UTC")).toInstant.toEpochMilli)
  }

  test("OPTIMIZE SMALL FILES packs only the small tail; big files keep their paths") {
    import graft.core.{Mutations, Versions => V}
    import org.apache.spark.sql.functions.lit
    val root = TestSpark.tmpDir("sql_optsmall")
    // one well-sized file (300k rows ≈ several MB of plain-encoded
    // doubles) + three tiny commit fragments
    Publish.publishVersioned(spark,
      spark.range(300000).select(col("id"),
        (col("id") * 1.0).as("v")), root, Nil)
    (0 until 3).foreach(b => Publish.publishVersioned(spark,
      Seq((1000000L + b, -1.0)).toDF("id", "v"), root, Nil, mode = "append"))
    // a DV delete over one tiny fragment: the pack must materialize it
    Mutations.deleteWhereDv(spark, root, org.apache.spark.sql.functions.col("id") === 1000001L)
    // "big" = v1's well-sized files (~600 KB here); the threshold sits
    // between them and the tiny fragments
    val bigFiles = V.snapshotAt(spark, root, 1)._1.toSet
    val before = Fetch.fetch(spark, root).count()
    val res = spark.sql(s"OPTIMIZE graft.`$root` SMALL FILES UNDER 100 KB").head()
    assert(res.getInt(1) >= 1)
    val latest = V.latestVersion(spark, root).get
    val (liveAfter, _, dvsAfter) = V.snapshotFullAt(spark, root, latest)
    // the big file(s) survived IN PLACE; the three fragments are gone
    assert(bigFiles.subsetOf(liveAfter.toSet))
    assert(liveAfter.size == bigFiles.size + res.getInt(1))
    // content identical (DV materialized into the packed file)
    assert(Fetch.fetch(spark, root).count() == before)
    assert(Fetch.fetch(spark, root)
      .where(org.apache.spark.sql.functions.col("id") === 1000001L).count() == 0)
    assert(V.readEntry(spark, root, latest).action == "rewrite")
    // DV still names only replaced files -> inert for reads of the new live set
    assert(dvsAfter.forall(_.files.forall(f => !liveAfter.contains(f))),
      s"dvs=${dvsAfter.map(_.files)} live=$liveAfter")
    // idempotent-ish: nothing small left (fragments packed into one file
    // that may still be under the threshold BUT alone -> <2 small = no-op)
    val again = spark.sql(s"OPTIMIZE graft.`$root` SMALL FILES UNDER 100 KB").head()
    assert(again.getInt(1) == 0)
    assert(V.latestVersion(spark, root).get == latest, "no-op must not commit")
  }

  test("CHECKPOINT statement + batch changeFeed read options") {
    import graft.core.Mutations
    import org.apache.spark.sql.functions.lit
    val root = TestSpark.tmpDir("sql_ckpt")
    Publish.publishVersioned(spark,
      (0 until 30).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Publish.publishVersioned(spark,
      (100 until 105).map(i => (i.toLong, -1.0)).toDF("id", "v"),
      root, Nil, mode = "append")                                    // v2
    val ck = spark.sql(s"CHECKPOINT graft.`$root`").head()
    assert(ck.getInt(0) == 2)
    assert(new java.io.File(root, "_graft_versions/c00000002.json").exists)
    val ck1 = GraftSql.exec(spark, s"CHECKPOINT graft.`$root` AT VERSION 1").head()
    assert(ck1.getInt(0) == 1)
    // batch change-feed read: the option shape of the streaming source
    Mutations.deleteWhereDv(spark, root, org.apache.spark.sql.functions.col("id") === 7) // v3
    val feed = spark.read.format("graft")
      .option("changeFeed", "true").option("startingVersion", "2").load(root)
    val got = feed.select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(got == ((100L until 105L).map(i => (i, "insert", 2)) :+ ((7L, "delete", 3))).sorted)
    // endingVersion bounds the window
    assert(spark.read.format("graft").option("changeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "2").load(root)
      .count() == 5)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("changeFeed", "true").load(root).count()
    }
  }
}
