package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AnnFunctions

/** The codegen ANN kernels ([[graft.functions.AnnOps]]) vs straightforward
  * reference math, with codegen FALLBACK DISABLED — a kernel whose
  * generated Java fails to compile would otherwise silently run
  * interpreted and hide the regression these expressions exist to fix.
  */
class AnnKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val dim = 12
  private val centroids: Array[Array[Double]] =
    Array.fill(5)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  private val vecs: Seq[(Long, Seq[Double])] =
    (0L until 50L).map(i => (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))

  // repartition so the kernel projection sits above an exchange — a bare
  // local relation gets folded by ConvertToLocalRelation and the codegen
  // assertions would inspect an empty plan
  private def base = vecs.toDF("id", "cv").repartition(2)
    .withColumn("cv", col("cv").cast("array<double>"))
    .withColumn("cn", sqrt(graft.functions.SketchFunctions.arrayDot(col("cv"), col("cv"))))

  private def refNearest(v: Array[Double], n: Double): Int =
    centroids.zipWithIndex.minBy { case (c, _) =>
      v.indices.map(i => { val x = v(i) / n - c(i); x * x }).sum
    }._2

  /** Run `body` with whole-stage-codegen fallback disabled so compile
    * failures in generated code surface as errors, not silent interpretation.
    */
  private def noFallback[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("nearestCell matches reference argmin and runs inside codegen") {
    val df = base.select(col("id"),
      AnnFunctions.nearestCell(col("cv"), col("cn"), centroids).as("cell"))
    val rows = noFallback(df.collect())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ann_nearest_cell"), plan)
    assert(raw"\*\(\d+\)".r.findFirstIn(plan).isDefined, s"no whole-stage codegen: $plan")
    val byId = vecs.toMap
    rows.foreach { r =>
      val v = byId(r.getLong(0)).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(r.getInt(1) == refNearest(v, n))
    }
  }

  test("probeCells returns the nprobe nearest cells ascending, ties by index") {
    val nprobe = 3
    val df = base.select(col("id"),
      AnnFunctions.probeCells(col("cv"), col("cn"), centroids, nprobe).as("cells"))
    val rows = noFallback(df.collect())
    val byId = vecs.toMap
    rows.foreach { r =>
      val v = byId(r.getLong(0)).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      val expected = centroids.zipWithIndex.map { case (c, idx) =>
        (v.indices.map(i => { val x = v(i) / n - c(i); x * x }).sum, idx)
      }.sortBy(identity).take(nprobe).map(_._2).toSeq
      assert(r.getSeq[Int](1) == expected)
    }
    // first probed cell is the assigned cell
    val joined = noFallback(base.select(col("id"),
      AnnFunctions.nearestCell(col("cv"), col("cn"), centroids).as("cell"),
      AnnFunctions.probeCells(col("cv"), col("cn"), centroids, 1).as("cells")).collect())
    joined.foreach(r => assert(r.getSeq[Int](2) == Seq(r.getInt(1))))
  }

  test("pqEncode picks the nearest codeword per subspace (lowest index on ties)") {
    val splits = Array(0, 6, dim)
    val books: Array[Array[Array[Double]]] = Array.fill(2)(
      Array.fill(4)(Array.fill(6)(rnd.nextDouble() * 2 - 1)))
    val df = base.select(col("id"),
      AnnFunctions.pqEncode(col("cv"), col("cn"), splits, books).as("code"))
    val rows = noFallback(df.collect())
    val byId = vecs.toMap
    rows.foreach { r =>
      val v = byId(r.getLong(0)).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      val expected = (0 until 2).map { s =>
        books(s).zipWithIndex.minBy { case (c, _) =>
          (splits(s) until splits(s + 1)).map { i =>
            val x = v(i) / n - c(i - splits(s)); x * x
          }.sum
        }._2
      }
      assert(r.getSeq[Int](1) == expected)
    }
  }

  test("adcScoreAll sums LUT entries; adcScoreCell agrees on probed cells") {
    val width = 4
    val luts: Array[Array[Double]] =
      Array.fill(3)(Array.fill(2 * width)(rnd.nextDouble()))
    val bcLuts = spark.sparkContext.broadcast(luts)
    val codes = Seq((0L, Seq(1, 3), 0), (1L, Seq(0, 2), 1), (2L, Seq(3, 0), 2))
      .toDF("id", "code", "cell")
    val all = noFallback(codes.select(col("id"),
      AnnFunctions.adcScoreAll(col("code"), bcLuts, width).as("sims")).collect())
    val byId = Map(0L -> Seq(1, 3), 1L -> Seq(0, 2), 2L -> Seq(3, 0))
    all.foreach { r =>
      val code = byId(r.getLong(0))
      val expected = luts.map(lut => code.zipWithIndex.map {
        case (c, s) => lut(s * width + c)
      }.sum).toSeq
      assert(r.getSeq[Double](1) == expected)
    }
    // cell 0 probed by queries 0 and 2; cell 1 by query 1; cell 2 by nobody
    val cellProbes: Array[Array[Int]] = Array(Array(0, 2), Array(1), Array.empty)
    val bcProbes = spark.sparkContext.broadcast(cellProbes)
    val perCell = noFallback(codes.select(col("id"),
      AnnFunctions.adcScoreCell(col("code"), col("cell"), bcLuts, bcProbes, width).as("e"))
      .collect())
    perCell.foreach { r =>
      val code = byId(r.getLong(0))
      val cell = Seq(0, 1, 2)(r.getLong(0).toInt)
      val es = r.getSeq[org.apache.spark.sql.Row](1)
      val expected = cellProbes(cell).toSeq.map { qi =>
        (qi, code.zipWithIndex.map { case (c, s) => luts(qi)(s * width + c) }.sum)
      }
      assert(es.map(e => (e.getInt(0), e.getDouble(1))) == expected)
    }
  }
}
