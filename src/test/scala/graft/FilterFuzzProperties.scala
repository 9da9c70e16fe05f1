package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.core.{ColFilter, DatasetMeta, Fetch, Filters}

/** Property-fuzz of the filter compiler: random (partition type, data,
  * filters) triples, the compiled Catalyst predicate vs a brute-force
  * in-memory evaluator implementing the REFERENCE semantics — per-value
  * OR-fold within a filter (including the `!=` multi-value quirk where
  * x != v1 OR x != v2 is a tautology for v1 ≠ v2, fetch_parq.py:471-476),
  * AND across filters, empty value list matches nothing.
  */
object FilterFuzzProperties extends Properties("FilterCompile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private lazy val spark = TestSpark.spark

  private final case class Domain(dt: DataType, values: Gen[Any])

  private val domains: Seq[Domain] = Seq(
    Domain(IntegerType, Gen.chooseNum(-5, 10)),
    Domain(LongType, Gen.chooseNum(-3L, 8L).map(l => l: java.lang.Long)),
    Domain(DoubleType, Gen.oneOf(-2.5, -1.0, 0.0, 0.5, 1.5, 2.0, 3.25, 7.0)),
    Domain(StringType, Gen.oneOf("a", "b", "c", "0001", "zz", "M")),
    Domain(BooleanType, Gen.oneOf(true, false)))

  private val rangeOps = Seq(">", "<", ">=", "<=")

  /** Valid filter for `d`: range ops only on numeric types and exactly one
    * value; values drawn from the domain generator, sometimes stringified
    * (the reference accepts string-form values for typed partitions).
    */
  private def filterGen(d: Domain): Gen[ColFilter] = {
    val opGen = d.dt match {
      case StringType | BooleanType => Gen.oneOf("==", "!=")
      case _ => Gen.frequency(2 -> Gen.const("=="), 2 -> Gen.const("!="),
        4 -> Gen.oneOf(rangeOps))
    }
    def maybeString(v: Any): Gen[Any] =
      Gen.frequency(3 -> Gen.const(v), 1 -> Gen.const(v.toString))
    for {
      op <- opGen
      n <- if (rangeOps.contains(op)) Gen.const(1)
           else Gen.frequency(1 -> Gen.const(0), 6 -> Gen.chooseNum(1, 3))
      vs <- Gen.listOfN(n, d.values.flatMap(maybeString))
    } yield ColFilter("p", op, vs)
  }

  private def caseGen: Gen[(Domain, List[Any], List[ColFilter])] = for {
    d <- Gen.oneOf(domains)
    rows <- Gen.listOfN(25, d.values)
    nf <- Gen.chooseNum(1, 3)
    fs <- Gen.listOfN(nf, filterGen(d))
  } yield (d, rows, fs)

  private def asDouble(v: Any): Double = v match {
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case l: java.lang.Long => l.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case other => throw new IllegalStateException(s"non-numeric $other")
  }

  /** Reference-semantics evaluation of one comparison, mirroring the typed
    * per-value comparison the reference applies to partition keys.
    */
  private def sat(op: String, x: Any, rawV: Any, dt: DataType): Boolean = {
    val v = rawV match {
      case s: String if dt != StringType => Fetch.parseValue(s, dt)
      case other => other
    }
    dt match {
      case StringType =>
        val (a, b) = (x.asInstanceOf[String], v.asInstanceOf[String])
        if (op == "==") a == b else a != b
      case BooleanType =>
        val (a, b) = (x.asInstanceOf[Boolean], v.asInstanceOf[Boolean])
        if (op == "==") a == b else a != b
      case _ =>
        val (a, b) = (asDouble(x), asDouble(v))
        op match {
          case "==" => a == b
          case "!=" => a != b
          case ">" => a > b
          case "<" => a < b
          case ">=" => a >= b
          case "<=" => a <= b
        }
    }
  }

  property("compiled predicate == reference OR-fold/AND semantics") =
    forAll(caseGen) { case (d, rows, filters) =>
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("p", d.dt, nullable = false)))
      val data = rows.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
      val df = spark.createDataFrame(data.asJava, schema)
      val meta = DatasetMeta(schema, Seq("p"))
      Filters.validateRules(filters)
      Filters.validateAgainst(meta, filters)
      val got = Filters.compile(meta, filters).map(df.where).getOrElse(df)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.zipWithIndex.collect {
        case (v, i) if filters.forall(f => f.values.exists(sat(f.comparison, v, _, d.dt))) =>
          i.toLong
      }.toSet
      (got == want) :| s"dt=${d.dt} filters=$filters got=$got want=$want"
    }

  property("range comparisons on string/bool partitions are rejected") =
    forAll(Gen.oneOf(rangeOps), Gen.oneOf(domains.filter(d =>
      d.dt == StringType || d.dt == BooleanType))) { (op, d) =>
      val schema = StructType(Seq(StructField("p", d.dt)))
      val meta = DatasetMeta(schema, Seq("p"))
      val v = d.values.sample.get
      Prop(throws(classOf[IllegalArgumentException]) {
        Filters.validateAgainst(meta, Seq(ColFilter("p", op, Seq(v))))
      })
    }

  property("range comparisons with multiple values are rejected") =
    forAll(Gen.oneOf(rangeOps), Gen.chooseNum(2, 4)) { (op, n) =>
      Prop(throws(classOf[IllegalArgumentException]) {
        Filters.validateRules(Seq(ColFilter("p", op, (1 to n).map(i => i: Any))))
      })
    }

  property("fractional values against integral partitions are rejected") =
    forAll(Gen.oneOf(IntegerType: DataType, LongType: DataType),
      Gen.oneOf(1.5, -0.25, 2.75)) { (dt, v) =>
      val schema = StructType(Seq(StructField("p", dt)))
      val meta = DatasetMeta(schema, Seq("p"))
      Prop(throws(classOf[IllegalArgumentException]) {
        Filters.validateAgainst(meta, Seq(ColFilter("p", "==", Seq(v))))
      })
    }

  private def throws(c: Class[_ <: Throwable])(body: => Unit): Boolean =
    try { body; false } catch {
      case t: Throwable => c.isInstance(t)
    }
}
