package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document/embedding clustering — the data-mixture and curation view of
  * an embedding corpus (topic-ish bucketing, per-cluster quotas, cluster
  * size diagnostics), built on the same scale discipline as the ANN
  * stack: centroid sets are tiny and ride broadcasts/closures, corpus
  * passes are single distributed scans, and the per-vector argmax is a
  * map-side-combined `max_by` aggregate — never a window sort over the
  * (corpus × centroids) similarity frame.
  */
object Clustering {

  /** Assign every vector to its nearest centroid by cosine similarity.
    *
    * `centroids` is a small frame `(cidCol, cvecCol)` — caller-supplied
    * (fixed anchors, a previous fit, label exemplars). It is broadcast;
    * the (corpus × centroids) similarity rows collapse to one row per
    * vector via `max_by` (ties broken toward the smaller centroid id, so
    * assignment is deterministic). Output: `(vec_id, cluster, sim)`.
    */
  def assignTo(embs: DataFrame, centroids: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding",
               cidCol: String = "cid", cvecCol: String = "cv"): DataFrame = {
    val e = embs.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", Similarity.l2Norm(col("v")))
      .where(col("n") > 0)
    val c = centroids.select(col(cidCol).as("cid"), col(cvecCol).cast("array<double>").as("cv"))
      .withColumn("cn", Similarity.l2Norm(col("cv")))
      .where(col("cn") > 0)
    // min over (-sim, cid): highest similarity first, ties to the SMALLER
    // centroid id — negating sim (always a double) rather than cid keeps
    // the tie-break valid for non-numeric centroid id types too
    e.crossJoin(broadcast(c))
      .withColumn("sim", round(Similarity.dot(col("v"), col("cv")) / (col("n") * col("cn")), 4))
      .groupBy("vec_id")
      .agg(min_by(struct(col("cid"), col("sim")),
        struct((-col("sim")).as("ns"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cluster"), col("best.sim").as("sim"))
  }

  /** K-means clustering of the corpus: fit on a bounded unbiased sample
    * (driver-side Lloyd — the [[Similarity.ivfFit]] coarse quantizer IS a
    * k-means clustering, exposed here as a first-class operator), assign
    * in one distributed pass. Output: `(vec_id, cluster)` with clusters
    * in `[0, k)`.
    */
  def kmeansAssign(embs: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   seed: Long = 42L, maxFitSample: Int = 25000): DataFrame =
    Similarity.ivfFit(embs, idCol, vecCol, nlist = k, seed = seed,
        maxFitSample = maxFitSample)
      .assigned.select(col("neighbor_id").as("vec_id"), col("cell").as("cluster"))

  /** Per-cluster diagnostics of an [[assignTo]] result: member count and
    * mean similarity to the assigned centroid (low mean = a loose,
    * probably-overbroad cluster). One hash aggregate.
    */
  def clusterStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), round(avg("sim"), 4).as("mean_sim"))
}
