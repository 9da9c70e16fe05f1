package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k of a SMALL query set against
  *    the full corpus: the query side is broadcast, so the corpus is
  *    scanned once with zero shuffle of corpus rows; per-query top-k via a
  *    windowed rank over (query, -sim).
  *  - [[lshTopK]] — approximate: both sides are bucketed by random
  *    hyperplane signatures across several hash tables; candidates are
  *    generated within buckets only, then exact cosine ranks the union.
  *    The scale path when the query set itself is large.
  */
object Similarity {

  /** Σ aᵢ·bᵢ via zip_with + aggregate — codegen'd, stays in the stage. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): uniform in [-1, 1), derived from xxhash64 so every executor
    * materializes the same planes with no broadcast of plane matrices.
    */
  private def planeComponent(t: Column, p: Column, d: Column): Column =
    pmod(xxhash64(concat_ws("_", t, p, d)), lit(20000)).cast("double") / 10000.0 - 1.0

  /** One `planes`-bit signature per hash table: bit p = sign of ⟨v, plane⟩. */
  def hyperplaneSigs(v: Column, planes: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), tIdx => struct(
      tIdx.as("t"),
      aggregate(
        sequence(lit(0), lit(planes - 1)),
        lit(0L),
        (acc, p) => {
          val proj = aggregate(
            zip_with(v, sequence(lit(0), size(v) - 1),
              (x, d) => x * planeComponent(tIdx, p, d)),
            lit(0.0), (a2, x) => a2 + x)
          acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))
        }).as("sig")))

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries` must be small (≲ thousands): it is broadcast and the corpus
    * streams past it — one corpus scan, no corpus shuffle, top-k via
    * window rank on the (tiny) candidate output.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val sims = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Approximate cosine top-k via hyperplane-LSH bucketing: corpus and
    * queries are signed with the same `tables`×`planes` hyperplanes,
    * joined on (table, signature), and the within-bucket union is ranked
    * by exact cosine. Recall grows with `tables`; cost stays
    * O(bucket size), never O(|corpus|·|queries|).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Int = 10, tables: Int = 8): DataFrame = {
    def signed(df: DataFrame, id: String, v: String, n: String) =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v))
        .withColumn(n, l2Norm(col(v)))
        .select(col(id), col(v), col(n), explode(hyperplaneSigs(col(v), planes, tables)).as("tb"))
        .select(col(id), col(v), col(n), col("tb.t"), col("tb.sig"))

    val c = signed(corpus, "neighbor_id", "cv", "cn")
    val q = signed(queries, "query_id", "qv", "qn")
    val cands = c.join(q, Seq("t", "sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
