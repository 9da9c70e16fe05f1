package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skew-heavy keys: AQE's skew-join split handles most
  * cases at runtime, but a pathological key (one value = 30% of 100 TB)
  * still bottlenecks a single reducer per key. Salting fans each key over
  * `salt` reducers: the big side gets a deterministic per-row salt, the
  * small side is replicated `salt`× (explode — cheap when the small side
  * is dimension-sized), and the join key becomes (key, salt).
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, fanning each key value over
    * `salt` reducers. Result equals `big.join(small, key)` for inner
    * equi-joins. The big-side salt derives from the row's own columns
    * (deterministic — retried tasks route identically, no rand()).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val bigCols: Seq[Column] = big.columns.toIndexedSeq.map(col)
    val bigS = big.withColumn("__salt", pmod(xxhash64(bigCols: _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
