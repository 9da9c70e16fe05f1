package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.core.{ColFilter, DatasetMeta, StatsIndex}

/** Property-fuzz of the data-skipping decision: for ANY file contents and
  * ANY filter, if some row satisfies the filter (reference semantics:
  * per-value OR-fold), the file's [min, max] interval must test
  * "might match" — a false skip silently drops correct rows, the one
  * failure mode a skipping index must never have. (The reverse direction
  * — skipping aggressiveness — is a perf property, asserted separately in
  * StatsIndexSpec on the z-ordered layout.)
  */
object StatsSkipProperties extends Properties("StatsSkip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val meta = DatasetMeta(
    StructType(Seq(StructField("v", DoubleType))), Nil)

  private val valueGen = Gen.oneOf(-7.5, -2.0, -1.0, 0.0, 0.5, 1.0, 2.5, 3.0, 9.0, 42.0)

  private val filterGen: Gen[ColFilter] = for {
    op <- Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
    n <- if (Set(">", "<", ">=", "<=").contains(op)) Gen.const(1) else Gen.chooseNum(1, 3)
    vs <- Gen.listOfN(n, valueGen)
  } yield ColFilter("v", op, vs)

  private def rowMatches(x: Double, f: ColFilter): Boolean =
    f.values.exists { v =>
      val y = v.asInstanceOf[Double]
      f.comparison match {
        case "==" => x == y
        case "!=" => x != y
        case ">"  => x > y
        case "<"  => x < y
        case ">=" => x >= y
        case "<=" => x <= y
      }
    }

  property("a file containing any matching row is never skipped") =
    forAll(Gen.nonEmptyListOf(valueGen), filterGen) { (rows, f) =>
      val anyMatch = rows.exists(rowMatches(_, f))
      val kept = StatsIndex.mightMatch(f, rows.min, rows.max, meta)
      !anyMatch || kept
    }

  property("an all-constant non-matching file may be skipped on == and !=") =
    forAll(valueGen, filterGen) { (x, f) =>
      val kept = StatsIndex.mightMatch(f, x, x, meta)
      // soundness on the degenerate interval too
      !rowMatches(x, f) || kept
    }
}
