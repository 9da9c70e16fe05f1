package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.shim

/** SQL surface for graft's native expressions: after registration, plain
  * `spark.sql` can call them —
  * `SELECT graft_fingerprint64(text), graft_simhash64(split(text, ' ')) …`.
  *
  * Two registration paths:
  *  - [[GraftSqlFunctions.register]] on any existing session;
  *  - `spark.sql.extensions=graft.functions.GraftSparkExtensions` at
  *    session build (the cluster-config path).
  */
object GraftSqlFunctions {

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name takes 1 argument")
    args.head
  }

  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fingerprint64" -> (args => Fingerprint64(one(args, "graft_fingerprint64"))),
    "graft_nfc_normalize" -> (args => NfcNormalize(one(args, "graft_nfc_normalize"))),
    "graft_simhash64" -> (args => SimHash64Expr(one(args, "graft_simhash64"))),
    "graft_shingles" -> (args => {
      require(args.length == 2, "graft_shingles(text, n)")
      ShinglesExpr(args.head, intArg(args(1), "graft_shingles"))
    }),
    "graft_minhash_sig" -> (args => {
      require(args.length == 2, "graft_minhash_sig(shingles, numHashes)")
      MinHashSigExpr(args.head, intArg(args(1), "graft_minhash_sig"))
    }),
    "graft_minhash_bands" -> (args => {
      require(args.length == 3, "graft_minhash_bands(shingles, numHashes, bands)")
      MinHashBandsExpr(args.head, intArg(args(1), "graft_minhash_bands"),
        intArg(args(2), "graft_minhash_bands"))
    }),
    "graft_hyperplane_sigs" -> (args => {
      require(args.length == 3, "graft_hyperplane_sigs(vec, planes, tables)")
      HyperplaneSigsExpr(args.head, intArg(args(1), "graft_hyperplane_sigs"),
        intArg(args(2), "graft_hyperplane_sigs"))
    }),
    "graft_array_dot" -> (args => {
      require(args.length == 2, "graft_array_dot(a, b)")
      ArrayDotExpr(args.head, args(1))
    }),
    // aggregates: a bare AggregateFunction from a registry builder is
    // wrapped into its AggregateExpression by the analyzer
    "graft_hll_distinct" -> (args => {
      require(args.length == 1 || args.length == 2, "graft_hll_distinct(x[, p])")
      HllDistinct(args.head,
        if (args.length == 2) intArg(args(1), "graft_hll_distinct") else 12)
    }),
    "graft_heavy_hitters" -> (args => {
      require(args.length == 2 || args.length == 3,
        "graft_heavy_hitters(item, k[, capacity])")
      val k = intArg(args(1), "graft_heavy_hitters")
      val cap = if (args.length == 3) intArg(args(2), "graft_heavy_hitters") else 4096
      HeavyHitters(args.head, cap, k)
    }),
    "graft_tdigest_quantiles" -> (args => {
      require(args.length >= 2, "graft_tdigest_quantiles(x, prob...)")
      TDigestQuantiles(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.DoubleType),
        args.tail.map(doubleArg(_, "graft_tdigest_quantiles")), 100)
    }),
    "graft_zvalue" -> (args => {
      require(args.length == 2, "graft_zvalue(array<bigint>, bits)")
      ZValueExpr(args.head, intArg(args(1), "graft_zvalue"))
    }),
    "graft_bloom_agg" -> (args => {
      require(args.length == 3, "graft_bloom_agg(key, numBits, numHashes)")
      BloomAgg(args.head, intArg(args(1), "graft_bloom_agg").toLong,
        intArg(args(2), "graft_bloom_agg"))
    }),
    "graft_count_min_agg" -> (args => {
      require(args.length == 3, "graft_count_min_agg(key, depth, width)")
      CountMinAgg(args.head, intArg(args(1), "graft_count_min_agg"),
        intArg(args(2), "graft_count_min_agg"))
    }))

  private def doubleArg(e: Expression, name: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name expects literal numeric probabilities, got $other")
  }

  /** Make every graft function callable from SQL on `spark`. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => shim.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point: the native functions plus the
  * lakehouse SQL surface (`SELECT … FROM graft.`path`` reads incl.
  * VERSION/TIMESTAMP AS OF, and DELETE/UPDATE/MERGE mutations —
  * [[graft.plans.GraftLakehouseRule]]).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSqlFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftSqlFunctions", name),
        b))
    }
    // HINT-resolution batch, not the main Resolution batch: since "graft"
    // is also a registered DataSource short name (format("graft")),
    // Spark's ResolveSQLOnFile would otherwise claim `graft.`path``
    // references first and fail them as direct-query-on-files (the
    // provider is not a FileFormat). The Hints batch runs BEFORE
    // Resolution, so graft's rule resolves its own references first.
    ext.injectHintResolutionRule(session => new graft.plans.GraftLakehouseRule(session))
    // maintenance statements Spark has no grammar for (OPTIMIZE / VACUUM /
    // RESTORE / DESCRIBE HISTORY) — everything else delegates verbatim
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}
