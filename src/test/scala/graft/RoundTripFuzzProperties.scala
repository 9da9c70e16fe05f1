package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.core.{Fetch, Publish}

/** Property-fuzz of the core publish→fetch contract: random schemas
  * (mixed atomic types, nullable data columns), random partition-column
  * subsets of every supported partition type, random row sets — published
  * then fetched back must return exactly the same rows, with the
  * original column order and the original partition types (the behavior
  * the reference guarantees via partition_data_types metadata and graft
  * via the sidecar).
  */
object RoundTripFuzzProperties extends Properties("PublishFetchRoundTrip") {

  // each case pays a real publish+fetch; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private final case class ColSpec(name: String, dt: DataType, gen: Gen[Any],
                                   partitionable: Boolean)

  // leading-zero strings ("0001") are the classic partition-type trap:
  // without the sidecar schema they'd re-infer as ints
  private val colSpecs: Seq[ColSpec] = Seq(
    ColSpec("c_int", IntegerType, Gen.chooseNum(-100, 100), partitionable = true),
    ColSpec("c_long", LongType, Gen.chooseNum(-5L, 5L), partitionable = true),
    ColSpec("c_str", StringType,
      Gen.oneOf(Gen.alphaNumStr.map(s => "v" + s.take(8)), Gen.oneOf("0001", "007", "x-y_z")),
      partitionable = true),
    ColSpec("c_bool", BooleanType, Gen.oneOf(true, false), partitionable = true),
    ColSpec("c_ts", TimestampType,
      Gen.chooseNum(0L, 4000000L).map(s => new Timestamp(1600000000000L + s * 1000L)),
      partitionable = true),
    ColSpec("c_double", DoubleType, Gen.chooseNum(-1000, 1000).map(_ / 8.0),
      partitionable = false),
    ColSpec("c_extra", StringType, Gen.alphaNumStr.map(s => "e" + s.take(6)),
      partitionable = false))

  private def caseGen: Gen[(Seq[ColSpec], Seq[String], Seq[Row])] = for {
    cols <- Gen.someOf(colSpecs).map(_.toSeq).suchThat(_.size >= 2)
    parts <- Gen.someOf(cols.filter(_.partitionable).map(_.name))
      .map(_.toSeq.take(2)).suchThat(_.size < cols.size)
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, Gen.sequence(cols.map { c =>
      if (parts.contains(c.name)) c.gen // partition values stay non-null
      else Gen.frequency(9 -> c.gen, 1 -> Gen.const(null))
    }).map(vs => Row(vs.asScala.toSeq: _*)))
  } yield (cols, parts, rows)

  private var caseId = 0
  private var zCaseId = 0

  private val opGen = Gen.oneOf("==", "!=", ">", "<", ">=", "<=")

  property("z-ordered + stats-indexed publish round-trips the same rows") =
    forAll(caseGen, opGen) { case ((cols, parts, rows), op) =>
      // z-order/stats apply to numeric/ts data columns not used as partitions
      val zCandidates = cols.filter(c => !parts.contains(c.name) &&
        (c.dt.isInstanceOf[NumericType] || c.dt == TimestampType)).map(_.name)
      val zCols = zCandidates.take(2)
      zCols.nonEmpty ==> {
        val schema = StructType(cols.map(c => StructField(c.name, c.dt, nullable = true)))
        val df = spark.createDataFrame(rows.asJava, schema)
        zCaseId += 1
        val root = s"${sys.props("java.io.tmpdir")}/graft_fuzz/zrt_$zCaseId"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        Publish.publish(spark, df, root, parts, zorderCols = zCols, statsCols = zCols)
        // read through the INDEXED path with a vacuous-true data filter on
        // the first z column is not possible for null-bearing data (nulls
        // never match a comparison) — use the plain fetch for the row
        // contract; the stats build itself must not corrupt anything
        val back = Fetch.fetch(spark, root)
        def key(r: Row): Seq[Any] = r.toSeq
        val want = rows.map(key).groupBy(identity).view.mapValues(_.size).toMap
        val got = back.collect().toSeq.map(key).groupBy(identity).view.mapValues(_.size).toMap
        val sameRows = want == got
        // end-to-end skip soundness: an indexed read with a data filter
        // must equal the plain read with the same row predicate — probe
        // with an ACTUAL data value (hits the == / >= boundaries where a
        // skip bug would bite) and a rotating comparison op
        val zc = zCols.head
        val zi = cols.indexWhere(_.name == zc)
        val probe = rows.iterator.map(r => r.get(zi)).find(_ != null)
        val skipSound = probe match {
          case None => true // all-null column: nothing to probe
          case Some(v) =>
            // op comes from the generator (not a mutable counter) so
            // shrinks and seed replays re-test the SAME comparison
            val f = graft.core.ColFilter(zc, op, Seq(v))
            val pred = graft.core.Filters.compileOn(
              c => cols.find(_.name == c).get.dt, Seq(f)).get
            Fetch.fetchIndexed(spark, root, Nil, Seq(f)).count() ==
              Fetch.fetch(spark, root).where(pred).count()
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        (sameRows :| s"z-ordered row mismatch parts=$parts z=$zCols " +
          s"missing=${(want.toSet -- got.toSet).take(3)} extra=${(got.toSet -- want.toSet).take(3)}") &&
          (skipSound :| s"indexed read diverged from plain filter on $zc case=$zCaseId")
      }
    }

  property("publish then fetch returns the same rows, order, and types") =
    forAll(caseGen) { case (cols, parts, rows) =>
      val schema = StructType(cols.map(c => StructField(c.name, c.dt, nullable = true)))
      val df = spark.createDataFrame(rows.asJava, schema)
      caseId += 1
      val root = s"${sys.props("java.io.tmpdir")}/graft_fuzz/rt_$caseId"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      Publish.publish(spark, df, root, parts)
      val back = Fetch.fetch(spark, root)
      val sameSchema = back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq
      // multiset compare (publish/fetch don't promise an order)
      def key(r: Row): Seq[Any] = r.toSeq
      val want = rows.map(key).groupBy(identity).view.mapValues(_.size).toMap
      val got = back.collect().toSeq.map(key).groupBy(identity).view.mapValues(_.size).toMap
      val sameRows = want == got
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      (sameSchema :| s"schema mismatch: ${back.schema.simpleString} vs ${schema.simpleString}") &&
        (sameRows :| s"row mismatch parts=$parts missing=${(want.toSet -- got.toSet).take(3)} extra=${(got.toSet -- want.toSet).take(3)}")
    }
}
