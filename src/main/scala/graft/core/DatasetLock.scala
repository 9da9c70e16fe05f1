package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Advisory writer lock for a graft dataset — the concurrent-writer
  * contract:
  *
  *  - WRITERS serialize: `publish(append)`, `publishDedupAppend`,
  *    `StatsIndex.build`/`appendFiles` and the sidecar/marker maintenance
  *    they perform run under this lock, so two simultaneous appends cannot
  *    interleave their listing-diff / stats-append / marker-restore steps
  *    (the race that could restore a completeness claim while the other
  *    writer's files lack stats rows, or double-insert "new" keys both
  *    writers proved absent).
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
  * best-effort mutual exclusion — the documented residual risk).
  *
  * Staleness is judged by the lock file's MODIFICATION TIME, never its
  * contents: a freshly created file always has mod-time ≈ now, so there is
  * no window (e.g. HDFS length-0 between the holder's create and close)
  * where a live writer's lock reads as ambiguous and gets broken. The
  * epoch stamp written inside the file is diagnostics only. The holder
  * TOUCHES the lock's mod-time every staleMs/4 for as long as the
  * critical section runs (daemon keepalive), so a live writer stays fresh
  * no matter how long its write takes — staleness really does mean
  * "crashed", not "slow". A lock whose
  * mod-time is older than `staleMs` is presumed crashed and broken via
  * RENAME-FIRST: a breaker renames the lock to a unique tombstone and only
  * the successful renamer deletes it — two contenders observing the same
  * stale lock cannot both "remove and re-acquire" it, because rename is
  * atomic where create-if-absent is. An unreadable/unstat-able lock (other
  * than not-found, which means the holder just released) is treated as
  * FRESH — we keep waiting until the deadline rather than breaking a lock
  * we cannot prove stale.
  *
  * Re-entrant per thread (publishDedupAppend calls publish(append) under
  * its own lock). `waitMs` is ONE overall budget: the in-process mutex and
  * the file lock share a single deadline, so worst-case blocking is
  * `waitMs`, not 2×.
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

  /** Smallest permitted `staleMs`. The holder's keepalive touches the lock
    * every staleMs/4; below ~this floor the FIRST touch could land after
    * the lock already looks stale to a contender, silently voiding the
    * live-holder guarantee. Values below the floor are clamped up.
    */
  val MinStaleMs = 1000L

  def withLock[T](spark: SparkSession, root: String,
                  waitMs: Long = 10L * 60 * 1000,
                  staleMs: Long = 30L * 60 * 1000)(body: => T): T = {
    val effectiveStaleMs = math.max(staleMs, MinStaleMs)
    val p = lockPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = fs.makeQualified(p).toString
    if (held.get.contains(key)) return body // re-entrant
    // one overall deadline across BOTH phases (in-process mutex + file lock)
    val deadline = System.currentTimeMillis() + waitMs
    val jl = jvmLocks.computeIfAbsent(key,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (!jl.tryLock(waitMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new IllegalStateException(
        s"timed out after ${waitMs}ms waiting for the in-process writer lock on $root")
    try withFileLock(spark, root, fs, key, deadline, waitMs, effectiveStaleMs)(body)
    finally jl.unlock()
  }

  /** Rename-first stale break: move the (presumed-crashed) lock to a
    * unique tombstone, then delete the tombstone. Rename is atomic on
    * HDFS-like filesystems, so of N contenders that all judged the same
    * lock stale, exactly one rename succeeds — the losers loop back to the
    * create-race instead of deleting a lock a third party may already have
    * re-acquired fresh. Returns whether THIS caller was the breaker.
    */
  private[graft] def tryBreakStale(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean = {
    val tomb = new Path(p.getParent,
      s"$FileName.break.${java.util.UUID.randomUUID().toString}")
    val won = try fs.rename(p, tomb) catch { case _: java.io.IOException => false }
    if (won) {
      try fs.delete(tomb, false) catch {
        case e: java.io.IOException =>
          // tombstone names start with '_' so listings already skip it;
          // log rather than fail the acquisition over cleanup
          System.err.println(s"[graft] could not delete lock tombstone $tomb: $e")
      }
    }
    won
  }

  private def withFileLock[T](spark: SparkSession, root: String,
                              fs: org.apache.hadoop.fs.FileSystem, key: String,
                              deadline: Long, waitMs: Long, staleMs: Long)(body: => T): T = {
    val p = lockPath(root)
    var acquired = false
    var fastRetries = 0
    // deadline is enforced on EVERY waiting path (not loop entry: the
    // first create attempt always runs, so a handoff arriving exactly at
    // the deadline still succeeds) — a root where create fails for a
    // non-contention reason (permissions, read-only fs: create throws,
    // stat finds nothing) times out at poll cost instead of spinning
    def checkDeadline(): Unit =
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"timed out after ${waitMs}ms waiting for the writer lock on $root " +
            s"(a lock breaks as stale after ${staleMs}ms of mod-time inactivity)")
    while (!acquired) {
      try {
        fs.mkdirs(p.getParent)
        val out = fs.create(p, false) // create-if-absent
        // diagnostics only — staleness is judged by mod-time, not contents
        try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          // held by someone: break if provably stale, else wait and retry
          val status =
            try Some(fs.getFileStatus(p))
            catch {
              case _: java.io.FileNotFoundException => None // just released
              case _: java.io.IOException => Some(null) // unreadable: treat as FRESH
            }
          status match {
            case None =>
              // holder released between create and stat — retry now, but a
              // PERSISTENT create-fails/stat-finds-nothing pattern is not
              // contention (unwritable root): back off so the deadline is
              // reached at poll cost, not at 100% CPU
              fastRetries += 1
              if (fastRetries > 3) { checkDeadline(); Thread.sleep(200) }
            case Some(st) =>
              fastRetries = 0
              val fresh = st == null ||
                (System.currentTimeMillis() - st.getModificationTime) <= staleMs
              if (!fresh) {
                // winner loops straight back to the create race; a LOSER may
                // be racing other breakers (fine, retry now) — but a
                // PERSISTENTLY failing break (fs denies rename yet allows
                // create/stat) must reach the deadline at poll cost, not
                // spin create->stat->failed-break at 100% CPU forever
                if (!tryBreakStale(fs, p)) { checkDeadline(); Thread.sleep(200) }
              } else {
                checkDeadline()
                Thread.sleep(200)
              }
          }
      }
    }
    held.get.add(key)
    // Keepalive: a LIVE writer whose critical section outlives staleMs
    // (a multi-TB build, a slow object store) must not have its lock
    // broken as "crashed" — touch the lock's mod-time well inside the
    // stale window for as long as body runs. Filesystems without setTimes
    // keep the old best-effort behavior (size the staleMs to the workload
    // there).
    val keepalive = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(200L, staleMs / 4))
          try fs.setTimes(p, System.currentTimeMillis(), -1)
          catch {
            // Hadoop surfaces a delivered interrupt as InterruptedIOException
            // (and nio as ClosedByInterruptException) with the interrupt
            // status CONSUMED — restore it or the stop signal is lost and
            // this thread would keep the lock path fresh forever
            case _: java.io.InterruptedIOException |
                 _: java.nio.channels.ClosedByInterruptException =>
              Thread.currentThread().interrupt()
            case _: Exception => () // unsupported/raced: best-effort
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-keepalive-$root")
    keepalive.setDaemon(true)
    keepalive.start()
    try body
    finally {
      keepalive.interrupt()
      held.get.remove(key)
      try fs.delete(p, false) catch {
        case e: Exception =>
          // a leaked lock self-heals via the stale break after staleMs,
          // but the operator should know the dataset is write-blocked
          System.err.println(s"[graft] could not release writer lock $p: $e")
      }
    }
  }
}
