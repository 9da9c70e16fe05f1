package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ---- Contention calibration (r14 verdict: the committed BENCH_r14 was
    // run on a contended machine and doubled every cell; nobody could tell
    // from the artifact). Before anything Spark runs, time a fixed CPU-bound
    // workload across `cpus` threads. On an idle box this takes a pinned,
    // machine-stable time; under external CPU contention the same work is
    // descheduled and the wall time inflates roughly with the load factor.
    // The measured seconds are stamped into the JSON as "calib" and, when
    // they exceed CALIB_BUDGET_SEC, "contended":true — so a polluted artifact
    // self-identifies and tools/bench_gate.py can refuse it outright.
    def calibrate(threads: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { i =>
        val t = new Thread(() => {
          var x = 0x9E3779B97F4A7C15L + i
          var n = 0L
          // ~0.15 s of xorshift per thread on an idle core; sink keeps the
          // JIT from eliding the loop
          while (n < 120000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1 }
          if (x == 42L) System.err.println("") // sink
        })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val calibSec = calibrate(cpus.toInt)
    // Idle local[32] box measures ~0.2-0.5 s (32 threads, one per core).
    // 3x headroom over the worst idle observation; beyond this the box is
    // genuinely contended and per-query times cannot be trusted.
    val CalibBudgetSec = sys.env.get("SPARK_GRAFT_CALIB_BUDGET").map(_.toDouble).getOrElse(1.5)
    val contended = calibSec > CalibBudgetSec
    if (contended)
      System.err.println(f"[bench] WARNING: calibration $calibSec%.2fs > budget $CalibBudgetSec%.2fs — box is contended, artifact stamped contended:true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Stress-run escape hatch (SPARK_GRAFT_SKIP=q1,q2): the ×N replicated
    // datasets plant every text/vector as an exact N-way duplicate group,
    // so the dedup pair queries' OUTPUT grows ~quadratically in N by
    // construction — not a plan defect (candidate generation stays
    // bucketed; PlanAudit covers it). Scale runs skip those cells and
    // document the skip; driver rounds set no skip and run everything.
    val skip: Set[String] =
      sys.env.get("SPARK_GRAFT_SKIP")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
    // a typo'd skip entry silently skipping NOTHING is exactly the failure
    // the list exists to prevent (the quadratic cell then runs at ×N)
    val unknown = skip -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"SPARK_GRAFT_SKIP names unknown queries: ${unknown.mkString(",")}")
    val queries = SparkEntry.queries.filterNot { case (n, _) => skip(n) }
    // Warm the session (JVM/codegen/FS) so the first timed query isn't
    // charged for startup.
    SparkEntry.entry(spark).count()
    // Untimed warmup pass over EVERY query: several queries lazily publish
    // scratch datasets under /tmp on first touch. In a cold sandbox that
    // one-time construction used to be charged to whichever query ran
    // first (r05: fetch_filter_in read 42 s for a 0.7 s query), making the
    // round artifact unusable. Running each query once here moves scratch
    // builds and page-cache warmup out of the timed loop; failures are
    // ignored — the timed loop reports them properly.
    // NonFatal warmup failures are logged and left for the timed loop to
    // report — fatal errors (OOM) must propagate, or the timed loop would
    // measure a poisoned JVM.
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Two timed passes, keep the per-query MIN: a transient contention
    // spike (GC on the box, another process waking) then inflates one
    // pass, not the artifact. Systemic contention still shows — that's
    // what the calibration stamp is for. Pass count is stamped so the
    // artifact says what it measured.
    val TimedPasses = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(2)
    def timedPass(): Map[String, Double] = queries.flatMap { case (name, fn) =>
      if (failed.contains(name)) None
      else {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
            // a failed query must not masquerade as a fast one: keep its
            // name OUT of the timing map and total (a fast failure would
            // read as a speedup) and flag it in the failed list
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
            false
          }
        if (ok) Some(name -> (System.nanoTime() - t0) / 1e9) else None
      }
    }.toMap
    val results = (1 to TimedPasses).map(_ => timedPass())
      .reduce((a, b) => (a.keySet intersect b.keySet).map(k => k -> math.min(a(k), b(k))).toMap)
    // 2-decimal per-query seconds: sub-10ms precision is scheduling noise,
    // and the line LENGTH matters — the driver keeps only the last ~2000
    // bytes of stdout, and round 3's full-precision line outgrew the
    // capture window, truncating the {"metric" prefix and leaving the
    // round's bench JSON unparseable. The empty failed list is omitted
    // for the same reason (round 2's line had no such field either).
    // ...and trailing zeros are trimmed ("1.20"→"1.2", "3.00"→"3"): ~1
    // byte per query of headroom inside the capture window.
    def f2(v: Double): String = {
      // Locale.ROOT: a comma-decimal default locale would emit 1,23 and
      // break the JSON artifact
      val s = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson =
      if (failed.isEmpty) ""
      else ",\"failed\":" + failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Slowest queries first: if the line must shrink (below), the cells
    // that carry the performance signal survive and only noise-floor cells
    // collapse into the rollup.
    val byTime = results.toSeq.sortBy { case (k, v) => (-v, k) }
    def render(keep: Int): String = {
      val qs = byTime.take(keep).map { case (k, v) => "\"" + k + "\":" + f2(v) }
        .mkString("{", ",", "}")
      val omitted = byTime.drop(keep)
      val om =
        if (omitted.isEmpty) ""
        else s""","omitted_fast":{"n":${omitted.size},"sec":${f2(omitted.map(_._2).sum)}}"""
      val cal = s""","calib":${f2(calibSec)},"passes":$TimedPasses""" +
        (if (contended) ""","contended":true""" else "")
      s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$om$failedJson$cal,"sf":"$sfDir"}"""
    }
    // The driver keeps only the last ~2000 bytes of stdout; a line past
    // that loses its {"metric" prefix and the ROUND'S BENCH ARTIFACT
    // PARSES AS NULL (it happened in round 3 at full float precision and
    // again in round 9 when the query count grew past ~78). Budget the
    // stdout line at 1900 bytes: print the full map when it fits,
    // otherwise keep the slowest cells and roll the fastest up into
    // omitted_fast (n + their summed seconds, so the total stays
    // reconstructable). BENCH_LOCAL.json always gets the full map.
    val full = render(byTime.size)
    val line =
      if (full.length <= 1900) full
      else (byTime.size to 0 by -1).iterator.map(render).find(_.length <= 1900).get
    // Belt and braces: also persist the full line to a file the regression
    // gate can always read, independent of any stdout capture window.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), full + "\n")
    println(line)
    spark.stop()
  }
}
