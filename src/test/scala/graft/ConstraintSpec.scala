package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ConstraintViolationException, Fetch, Mutations, Publish, Versions}
import graft.plans.GraftSql

/** Table CHECK constraints: metadata-only alter commits whose expression
  * gates every subsequent versioned write (append, overwrite, UPDATE/
  * MERGE replacement rows). SQL CHECK semantics — only FALSE violates,
  * NULL passes.
  */
class ConstraintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = TestSpark.tmpDir(name)
    Publish.publishVersioned(spark,
      (1 to 50).map(i => (i.toLong, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    root
  }

  test("violating appends are rejected atomically; valid ones commit") {
    val root = fresh("cons_append")
    Versions.addConstraint(spark, root, "v_positive", "v > 0")
    val before = Versions.latestVersion(spark, root).get
    val ex = intercept[ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((100L, "g0", -1.0)).toDF("id", "grp", "v"), root, Seq("grp"), mode = "append")
    }
    assert(ex.getMessage.contains("v_positive"))
    assert(Versions.latestVersion(spark, root).contains(before), "no commit landed")
    assert(Fetch.fetch(spark, root).count() == 50)
    Publish.publishVersioned(spark,
      Seq((100L, "g0", 5.0)).toDF("id", "grp", "v"), root, Seq("grp"), mode = "append")
    assert(Fetch.fetch(spark, root).count() == 51)
  }

  test("constraints persist across logical overwrite and gate it too") {
    val root = fresh("cons_overwrite")
    Versions.addConstraint(spark, root, "id_nonneg", "id >= 0")
    intercept[ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((-1L, "g0", 1.0)).toDF("id", "grp", "v"), root, Seq("grp"))
    }
    Publish.publishVersioned(spark,
      Seq((7L, "g0", 1.0)).toDF("id", "grp", "v"), root, Seq("grp"))
    // the constraint survived the overwrite
    assert(Versions.constraintsOf(spark, root) == Map("id_nonneg" -> "id >= 0"))
    intercept[ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((-2L, "g0", 1.0)).toDF("id", "grp", "v"), root, Seq("grp"), mode = "append")
    }
  }

  test("UPDATE and MERGE replacement rows are gated, DV paths included") {
    val root = fresh("cons_update")
    Versions.addConstraint(spark, root, "v_cap", "v <= 1000")
    intercept[ConstraintViolationException] {
      Mutations.updateWhere(spark, root, col("id") === 1L, Map("v" -> lit(2000.0)))
    }
    intercept[ConstraintViolationException] {
      Mutations.updateWhereDv(spark, root, col("id") === 1L, Map("v" -> lit(2000.0)))
    }
    assert(Fetch.fetch(spark, root).where(col("v") > 1000).count() == 0)
    Mutations.updateWhere(spark, root, col("id") === 1L, Map("v" -> lit(999.0)))
    assert(Fetch.fetch(spark, root).where(col("id") === 1L)
      .select("v").as[Double].head() == 999.0)
  }

  test("NULL passes (SQL CHECK), IS NOT NULL expresses NOT NULL") {
    val root = TestSpark.tmpDir("cons_null")
    Publish.publishVersioned(spark,
      Seq((1L, "g0", Some(1.0))).toDF("id", "grp", "v"), root, Seq("grp"))
    Versions.addConstraint(spark, root, "v_pos", "v > 0")
    // NULL v: `v > 0` is NULL, not FALSE -> passes
    Publish.publishVersioned(spark,
      Seq((2L, "g0", None: Option[Double])).toDF("id", "grp", "v"),
      root, Seq("grp"), mode = "append")
    assert(Fetch.fetch(spark, root).count() == 2)
    // a NOT NULL constraint cannot be added while a NULL row exists
    // (existing-data validation) ...
    intercept[ConstraintViolationException] {
      Versions.addConstraint(spark, root, "v_notnull", "v IS NOT NULL")
    }
    // ... but after deleting the NULL row it can, and then gates writes
    Mutations.deleteWhere(spark, root, col("v").isNull)
    Versions.addConstraint(spark, root, "v_notnull", "v IS NOT NULL")
    intercept[ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((3L, "g0", None: Option[Double])).toDF("id", "grp", "v"),
        root, Seq("grp"), mode = "append")
    }
  }

  test("adding a constraint existing data violates is rejected") {
    val root = fresh("cons_existing")
    val ex = intercept[ConstraintViolationException] {
      Versions.addConstraint(spark, root, "impossible", "v > 1e9")
    }
    assert(ex.getMessage.contains("existing"))
    assert(Versions.constraintsOf(spark, root).isEmpty)
  }

  test("drop constraint lifts the gate; SQL verbs round-trip") {
    val root = fresh("cons_sql")
    GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    assert(Versions.constraintsOf(spark, root) == Map("v_pos" -> "v > 0"))
    intercept[ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((60L, "g0", -1.0)).toDF("id", "grp", "v"), root, Seq("grp"), mode = "append")
    }
    GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` DROP CONSTRAINT v_pos").collect()
    Publish.publishVersioned(spark,
      Seq((60L, "g0", -1.0)).toDF("id", "grp", "v"), root, Seq("grp"), mode = "append")
    assert(Fetch.fetch(spark, root).count() == 51)
  }
}
