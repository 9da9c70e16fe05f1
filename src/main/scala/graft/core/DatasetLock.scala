package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Advisory writer lock for a graft dataset — the concurrent-writer
  * contract:
  *
  *  - WRITERS serialize: `publish(append)`, `publishDedupAppend` and the
  *    sidecar/marker maintenance they perform run under this lock, so two
  *    simultaneous appends cannot interleave their listing-diff /
  *    stats-append / marker-restore steps (the race that could restore a
  *    completeness claim while the other writer's files lack stats rows,
  *    or double-insert "new" keys both writers proved absent).
  *  - READERS never lock: fetch/fetchIndexed see either the pre- or
  *    post-write state; mid-write they see data files without the
  *    completeness marker (the writer takes it down first) and fall back
  *    to the conservative listing path. No torn reads, no reader stalls.
  *  - `overwrite` publishes are last-writer-wins BY DESIGN (the
  *    reference's S3 object-overwrite semantics) and don't take the lock.
  *  - Compaction writes to a fresh `dest` (snapshot semantics: appends
  *    landing on `src` mid-compaction are not carried) and locks only the
  *    destination it is building.
  *
  * Mechanics: create-if-absent of `root/_graft_lock` (atomic on
  * HDFS-like filesystems; object stores without conditional create get
  * best-effort mutual exclusion — the documented residual risk). The
  * holder stamps an epoch; a lock older than `staleMs` is presumed
  * crashed and broken (delete + re-acquire), so an abandoned lock never
  * bricks the dataset. Re-entrant per thread (publishDedupAppend calls
  * publish(append) under its own lock).
  */
object DatasetLock {

  val FileName = "_graft_lock"

  /** Thread-reentrancy: roots (qualified) the current thread already holds. */
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  /** Same-process writers serialize on a JVM mutex FIRST: a local or
    * checksummed filesystem's create-if-absent is check-then-create, not
    * atomic, so two threads of one driver could both "acquire" the file.
    * The file remains the cross-PROCESS guard (atomic create on
    * HDFS-like stores; object stores without conditional create get
    * best-effort exclusion — the documented residual).
    */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  private def lockPath(root: String) = new Path(root, FileName)

  def withLock[T](spark: SparkSession, root: String,
                  waitMs: Long = 10L * 60 * 1000,
                  staleMs: Long = 30L * 60 * 1000)(body: => T): T = {
    val p = lockPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = fs.makeQualified(p).toString
    if (held.get.contains(key)) return body // re-entrant
    val jl = jvmLocks.computeIfAbsent(key,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (!jl.tryLock(waitMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"timed out after ${waitMs}ms waiting for the in-process writer lock on $root")
    try withFileLock(spark, root, fs, key, waitMs, staleMs)(body)
    finally jl.unlock()
  }

  private def withFileLock[T](spark: SparkSession, root: String,
                              fs: org.apache.hadoop.fs.FileSystem, key: String,
                              waitMs: Long, staleMs: Long)(body: => T): T = {
    val p = lockPath(root)
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try {
        fs.mkdirs(p.getParent)
        val out = fs.create(p, false) // create-if-absent
        try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          // held by someone: break if stale, else wait and retry
          val stampedAt = try {
            val in = fs.open(p)
            try new String({
              val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
              in.readFully(bytes); bytes
            }, "UTF-8").trim.toLong
            finally in.close()
          } catch { case _: Exception => 0L } // vanished/corrupt: treat as stale
          if (System.currentTimeMillis() - stampedAt > staleMs) {
            fs.delete(p, false) // break the crashed writer's lock and retry
          } else {
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"timed out after ${waitMs}ms waiting for the writer lock on $root " +
                  s"(held since epoch-ms $stampedAt; it breaks as stale after ${staleMs}ms)")
            Thread.sleep(200)
          }
      }
    }
    held.get.add(key)
    try body
    finally {
      held.get.remove(key)
      try fs.delete(p, false) catch { case _: Exception => () }
    }
  }
}
