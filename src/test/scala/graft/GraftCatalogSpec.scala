package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Versions

/** V2 `TableCatalog`: `CREATE TABLE cat.db.t … PARTITIONED BY (days(ts),
  * bucket(4, id))` as first-class DDL — the shape the session catalog
  * cannot store for a TableProvider (#195's documented workaround).
  */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = TestSpark.tmpDir("gcat_wh")
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    dir
  }

  test("transform DDL round-trip: create, insert re-derives, read hides, filter prunes") {
    wh
    spark.sql("""CREATE TABLE gcat.db.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      USING graft PARTITIONED BY (days(ts), bucket(4, id))""")
    // reported schema is the USER schema — derived partition cols hidden
    assert(spark.table("gcat.db.ev").schema.fieldNames.toSeq ==
      Seq("id", "ts", "v"))
    val rows = (0 until 40).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-${i % 4 + 1} 10:00:00"), i * 1.0))
    rows.toDF("id", "ts", "v").createOrReplaceTempView("ev_src")
    spark.sql("INSERT INTO gcat.db.ev SELECT * FROM ev_src")
    // physical layout: hive dirs for BOTH derived columns
    val dirs = new java.io.File(s"$wh/db/ev").listFiles().map(_.getName).toSet
    assert(dirs.exists(_.startsWith("tp_days_ts=")), s"derived day dirs, got $dirs")
    val got = spark.table("gcat.db.ev").select("id", "v")
      .as[(Long, Double)].collect().toSet
    assert(got == rows.map(r => (r._1, r._3)).toSet)
    // a raw-column filter prunes partitions: only one day's files scanned
    val (res, recs) = IoMetrics.recordsReadDuring(spark) {
      spark.sql("SELECT count(*) FROM gcat.db.ev WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'")
        .collect()(0).getLong(0)
    }
    assert(res == rows.count(_._2.getTime >=
      java.sql.Timestamp.valueOf("2024-01-04 00:00:00").getTime))
    assert(recs <= 10, s"day-pruned scan must not read the other days, read $recs")
  }

  test("identity partitioning, SHOW TABLES, RENAME, DROP") {
    wh
    spark.sql("""CREATE TABLE gcat.db.pl (k BIGINT, part STRING)
      USING graft PARTITIONED BY (part)""")
    Seq((1L, "a"), (2L, "b")).toDF("k", "part").createOrReplaceTempView("pl_src")
    spark.sql("INSERT INTO gcat.db.pl SELECT * FROM pl_src")
    assert(spark.table("gcat.db.pl").count() == 2)
    assert(spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("pl"))
    // RENAME TO resolves inside the same catalog — name it catalog-free
    spark.sql("ALTER TABLE gcat.db.pl RENAME TO db.pl2")
    assert(spark.table("gcat.db.pl2").count() == 2)
    intercept[Exception] { spark.table("gcat.db.pl").collect() }
    spark.sql("DROP TABLE gcat.db.pl2")
    assert(!new java.io.File(s"$wh/db/pl2").exists(),
      "a managed table's directory dies with it")
  }

  test("versioned table property: commit-logged from the first insert") {
    wh
    spark.sql("""CREATE TABLE gcat.db.vt (k BIGINT, part STRING)
      USING graft PARTITIONED BY (part) TBLPROPERTIES ('versioned'='true')""")
    val root = s"$wh/db/vt"
    assert(Versions.isVersioned(spark, root), "CREATE commits an empty v1")
    assert(spark.table("gcat.db.vt").count() == 0)
    Seq((1L, "a"), (2L, "b")).toDF("k", "part").createOrReplaceTempView("vt_src")
    spark.sql("INSERT INTO gcat.db.vt SELECT * FROM vt_src")
    assert(Versions.latestVersion(spark, root).contains(2))
    assert(spark.table("gcat.db.vt").count() == 2)
    // and the path-addressed lakehouse surface composes: mutate by path,
    // read back through the catalog identifier
    graft.core.Mutations.deleteWhere(spark, root, col("k") === 1L)
    assert(spark.table("gcat.db.vt").as[(Long, String)].collect().toSet ==
      Set((2L, "b")))
  }

  test("ALTER TABLE SET TBLPROPERTIES persists; schema changes refused") {
    wh
    spark.sql("CREATE TABLE gcat.db.props (k BIGINT) USING graft")
    spark.sql("ALTER TABLE gcat.db.props SET TBLPROPERTIES ('owner.team'='ml')")
    // properties survive a reload
    val t = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "props"))
    assert(t.properties().get("owner.team") == "ml")
    // ADD COLUMN is now first-class (metadata-only additive evolution,
    // #215); OTHER schema changes still route to the engine verbs
    spark.sql("ALTER TABLE gcat.db.props ADD COLUMN extra BIGINT")
    assert(spark.table("gcat.db.props").columns.toSeq == Seq("k", "extra"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.props RENAME COLUMN k TO kk")
    }
    assert(e.getMessage.toLowerCase.contains("propert") ||
      e.getMessage.toLowerCase.contains("support"))
  }

  test("CTAS through the catalog (non-atomic createTable + insert)") {
    wh
    spark.sql("""CREATE TABLE gcat.db.ctas USING graft AS
      SELECT id AS k, CAST(id % 3 AS STRING) AS part, id * 2 AS v
      FROM range(30)""")
    assert(spark.table("gcat.db.ctas").count() == 30)
    assert(spark.table("gcat.db.ctas").schema.fieldNames.toSeq ==
      Seq("k", "part", "v"))
  }

  test("external LOCATION table: load, insert, rename (metadata-only), drop keeps data") {
    wh
    val loc = TestSpark.tmpDir("gcat_ext_loc")
    spark.sql(s"""CREATE TABLE gcat.db.ext (k BIGINT, part STRING)
      USING graft PARTITIONED BY (part) LOCATION '$loc'""")
    // resolvable by NAME: the managed slot carries a pointer to LOCATION
    assert(spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("ext"))
    Seq((1L, "a"), (2L, "b")).toDF("k", "part").createOrReplaceTempView("ext_src")
    spark.sql("INSERT INTO gcat.db.ext SELECT * FROM ext_src")
    assert(spark.table("gcat.db.ext").count() == 2)
    // the data lives at LOCATION, not under the warehouse
    assert(new java.io.File(loc).listFiles().exists(_.getName.startsWith("part=")))
    // duplicate create on the same identifier is refused
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE gcat.db.ext (k BIGINT) USING graft LOCATION '$loc'")
    }
    // rename moves the pointer only; LOCATION's bytes do not move
    spark.sql("ALTER TABLE gcat.db.ext RENAME TO db.ext2")
    assert(spark.table("gcat.db.ext2").count() == 2)
    intercept[Exception] { spark.table("gcat.db.ext").collect() }
    // drop unregisters without touching the external data
    spark.sql("DROP TABLE gcat.db.ext2")
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("ext2"))
    assert(new java.io.File(loc).listFiles().exists(_.getName.startsWith("part=")),
      "external data survives DROP")
  }

  test("guard rails: duplicate create, unknown table, mixed partition spec") {
    wh
    spark.sql("CREATE TABLE gcat.db.dup (k BIGINT) USING graft")
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.dup (k BIGINT) USING graft")
    }
    intercept[Exception] { spark.table("gcat.db.no_such").collect() }
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE gcat.db.mixed (k BIGINT, ts TIMESTAMP, p STRING)
        USING graft PARTITIONED BY (p, days(ts))""")
    }
    assert(e.getMessage.contains("mixing identity"))
  }
}
