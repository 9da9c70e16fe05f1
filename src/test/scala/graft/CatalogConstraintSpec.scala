package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ConstraintViolationException

/** Catalog-level CHECK constraints (`SUPPORT_TABLE_CONSTRAINT`): CREATE
  * TABLE with CHECK, ALTER ADD/DROP CONSTRAINT — mapped onto the engine's
  * versioned CHECK machinery; the table REPORTS user constraints, so a
  * violating SQL INSERT dies in Spark's own injected pre-write check
  * (CHECK_CONSTRAINT_VIOLATION) and any path that bypasses it dies at
  * the engine's commit gate (ConstraintViolationException) — either
  * rejection is the contract.
  */
class CatalogConstraintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val dir = TestSpark.tmpDir("gcon_wh")
    spark.conf.set("spark.sql.catalog.gcon", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcon.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcon.db")
    dir
  }

  test("CREATE with CHECK gates inserts; DESCRIBE-visible; DROP lifts it") {
    wh
    spark.sql("""CREATE TABLE gcon.db.c1 (id BIGINT, qty BIGINT,
      CONSTRAINT qty_pos CHECK (qty > 0)) USING graft
      TBLPROPERTIES ('versioned'='true')""")
    spark.sql("INSERT INTO gcon.db.c1 VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcon.db.c1 VALUES (2, -1)")
    }
    assert(isCheckViolation(e), e.toString)
    // reported through the table's constraints() surface
    val cons = spark.sessionState.catalogManager.catalog("gcon")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c1"))
      .constraints()
    assert(cons.exists(_.name() == "qty_pos"), cons.mkString(","))
    spark.sql("ALTER TABLE gcon.db.c1 DROP CONSTRAINT qty_pos")
    spark.sql("INSERT INTO gcon.db.c1 VALUES (2, -1)")
    assert(spark.table("gcon.db.c1").count() == 2)
  }

  test("ALTER ADD CONSTRAINT validates existing data; informational flavors refused") {
    wh
    spark.sql("""CREATE TABLE gcon.db.c2 (id BIGINT) USING graft
      TBLPROPERTIES ('versioned'='true')""")
    spark.sql("INSERT INTO gcon.db.c2 VALUES (-5)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcon.db.c2 ADD CONSTRAINT pos CHECK (id > 0)")
    }
    assert(isCheckViolation(e), e.toString)
    spark.sql("ALTER TABLE gcon.db.c2 ADD CONSTRAINT gt10 CHECK (id > -10)")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO gcon.db.c2 VALUES (-11)")
    }
    assert(isCheckViolation(e2), e2.toString)
  }

  test("CHECK on an unversioned table refused with guidance") {
    wh
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE gcon.db.c3 (id BIGINT,
        CONSTRAINT pos CHECK (id > 0)) USING graft""")
    }
    assert(e.getMessage.contains("versioned"), e.getMessage)
  }

  /** Spark's injected pre-write check OR the engine's commit gate. */
  private def isCheckViolation(e: Throwable): Boolean = {
    var cur: Throwable = e
    while (cur != null) {
      if (cur.isInstanceOf[ConstraintViolationException]) return true
      if (cur.getMessage != null &&
          cur.getMessage.contains("CHECK_CONSTRAINT_VIOLATION")) return true
      cur = cur.getCause
    }
    false
  }
}
