package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.core.{Fetch, Mutations, Publish}

// top-level so the Dataset encoder codegens (a nested case class falls
// back to interpreted projections and floods the log with WARNs)
final case class MutFuzzRow(id: Long, grp: String, v: Long)

/** Property-fuzz of the row-level mutation semantics against in-memory
  * reference implementations: for random datasets, partitionings,
  * predicates and merge sources, the mutated snapshot must equal what
  * plain Scala collection ops compute — DELETE ≡ filterNot(pred true),
  * UPDATE ≡ map-with-condition, MERGE ≡ (target keys replaced by source)
  * ∪ inserts. Every case runs the full locate→rewrite→commit path on a
  * real published dataset.
  */
object MutationFuzzProperties extends Properties("RowLevelMutations") {

  // each case pays real publishes + a mutation; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val caseGen: Gen[(Seq[MutFuzzRow], Int, Int, Boolean)] = for {
    n        <- Gen.chooseNum(1, 120)
    nGrp     <- Gen.chooseNum(1, 4)
    rows     <- Gen.listOfN(n, for {
                  id <- Gen.chooseNum(0L, 200L)
                  g  <- Gen.chooseNum(0, nGrp - 1)
                  v  <- Gen.chooseNum(-50L, 50L)
                } yield MutFuzzRow(id, s"g$g", v))
    threshold   <- Gen.chooseNum(-60, 60)
    partitioned <- Gen.oneOf(true, false)
  } yield (rows.distinctBy(_.id), nGrp, threshold, partitioned)

  private def freshRoot(rows: Seq[MutFuzzRow], partitioned: Boolean): String = {
    import spark.implicits._
    val root = TestSpark.tmpDir("mutfuzz")
    Publish.publishVersioned(spark, rows.toDF("id", "grp", "v"),
      root, if (partitioned) Seq("grp") else Nil)
    root
  }

  private def snapshot(root: String): Set[MutFuzzRow] = {
    import spark.implicits._
    Fetch.fetch(spark, root).select("id", "grp", "v").as[MutFuzzRow].collect().toSet
  }

  property("deleteWhere ≡ filterNot(pred is true)") =
    forAll(caseGen) { case (rows, _, threshold, partitioned) =>
      if (rows.isEmpty) true
      else {
        val root = freshRoot(rows, partitioned)
        Mutations.deleteWhere(spark, root,
          col("v") > threshold && col("grp") =!= "g2")
        val expect = rows.filterNot(r => r.v > threshold && r.grp != "g2").toSet
        snapshot(root) == expect
      }
    }

  property("updateWhere ≡ map-with-condition") =
    forAll(caseGen) { case (rows, _, threshold, partitioned) =>
      if (rows.isEmpty) true
      else {
        val root = freshRoot(rows, partitioned)
        Mutations.updateWhere(spark, root, col("v") <= threshold,
          Map("v" -> (col("v") * 10 + 1)))
        val expect = rows.map(r =>
          if (r.v <= threshold) r.copy(v = r.v * 10 + 1) else r).toSet
        snapshot(root) == expect
      }
    }

  property("merge ≡ keyed replace ∪ insert") =
    forAll(caseGen) { case (rows, nGrp, threshold, partitioned) =>
      if (rows.isEmpty) true
      else {
        import spark.implicits._
        val root = freshRoot(rows, partitioned)
        // source: every id ≡ 0 mod 3 from the SAME id domain — some hit,
        // some insert; values/groups reshuffled deterministically
        val src = (0L to 200L by 3).filter(i => i <= threshold + 140)
          .map(i => MutFuzzRow(i, s"g${(i % nGrp).toInt}", i - 7))
        if (src.isEmpty) true
        else {
          Mutations.merge(spark, root, src.toDF("id", "grp", "v"), Seq("id"))
          val srcById = src.map(r => r.id -> r).toMap
          val expect = (rows.filterNot(r => srcById.contains(r.id)) ++ src).toSet
          snapshot(root) == expect
        }
      }
    }

  property("applyChanges ≡ delete-filter ∘ keyed replace ∪ insert") =
    forAll(caseGen) { case (rows, nGrp, threshold, partitioned) =>
      if (rows.isEmpty) true
      else {
        import spark.implicits._
        val root = freshRoot(rows, partitioned)
        // disjoint key sets: %3 keys upsert, %5 (minus %3) keys delete
        val ups = (0L to 200L by 3).filter(i => i <= threshold + 140)
          .map(i => MutFuzzRow(i, s"g${(i % nGrp).toInt}", i + 1))
        val dels = (0L to 200L by 5).filter(_ % 3 != 0)
        val changes =
          ups.map(r => (r.id, r.grp, r.v, "upsert")) ++
            dels.map(i => (i, "gX", 0L, "delete"))
        if (changes.isEmpty) true
        else {
          graft.core.Mutations.applyChanges(spark, root,
            changes.toDF("id", "grp", "v", "_op"), Seq("id"))
          val upById = ups.map(r => r.id -> r).toMap
          val delSet = dels.toSet
          val expect = (rows.filterNot(r => upById.contains(r.id)) ++ ups)
            .filterNot(r => delSet.contains(r.id)).toSet
          snapshot(root) == expect
        }
      }
    }
}
