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

  // ------------------------------------------------------------- DECIMAL
  // Decimal columns store double-EMBEDDED bounds (Spark's decimal→double
  // cast) while rows compare as exact decimals: the 2-ulp slack must
  // absorb the embedding error for values doubles can't represent
  // ("0.10", ten-digit prices) — a false skip here would silently drop
  // matching rows from every money-column fetchIndexed.
  private val decMeta = DatasetMeta(
    StructType(Seq(StructField("v", DecimalType(12, 2)))), Nil)

  private val decValueGen: Gen[BigDecimal] = Gen.oneOf(
    BigDecimal("-9999999999.99"), BigDecimal("-42.55"), BigDecimal("-0.10"),
    BigDecimal("0.00"), BigDecimal("0.10"), BigDecimal("0.15"),
    BigDecimal("1.00"), BigDecimal("42.55"), BigDecimal("90000.00"),
    BigDecimal("9999999999.98"), BigDecimal("9999999999.99"))

  private val decFilterGen: Gen[ColFilter] = for {
    op <- Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
    n <- if (Set(">", "<", ">=", "<=").contains(op)) Gen.const(1) else Gen.chooseNum(1, 3)
    vs <- Gen.listOfN(n, decValueGen)
  } yield ColFilter("v", op, vs)

  private def decRowMatches(x: BigDecimal, f: ColFilter): Boolean =
    f.values.exists { v =>
      val y = v.asInstanceOf[BigDecimal]
      f.comparison match {
        case "==" => x == y
        case "!=" => x != y
        case ">"  => x > y
        case "<"  => x < y
        case ">=" => x >= y
        case "<=" => x <= y
      }
    }

  property("decimal: a file containing any matching row is never skipped") =
    forAll(Gen.nonEmptyListOf(decValueGen), decFilterGen) { (rows, f) =>
      val anyMatch = rows.exists(decRowMatches(_, f))
      // bounds as statsFor stores them: decimal min/max cast to double
      val kept = StatsIndex.mightMatch(f, rows.min.toDouble, rows.max.toDouble, decMeta)
      !anyMatch || kept
    }
}
