package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job time attribution for a named bench cell (guide §1: measure
  * first). Runs each query once untimed (scratch build + page cache),
  * then once instrumented, and prints every Spark job the run launched —
  * call site, description, wall ms — slowest first, plus the gap between
  * summed job time and the cell's wall clock (driver-side planning /
  * commit / listing time lives in that gap). Diagnostic tool only; the
  * driver contract lives in [[Bench]].
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(site: String, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val desc = Option(e.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, J(site, desc, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })
    final case class St(name: String, ms: Long, tasks: Int, metrics: String)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        def acc(n: String): Long = si.accumulables.values
          .find(_.name.contains(n)).flatMap(_.value).map(_.toString.toLong).getOrElse(0L)
        val m = f"in=${acc("input.bytesRead") / 1048576.0}%.0fMB sw=${acc("shuffle.write.bytesWritten") / 1048576.0}%.0fMB sr=${acc("shuffle.read.remoteBytesRead") + acc("shuffle.read.localBytesRead")}%d"
        stages.add(St(si.name, ms, si.numTasks, m))
      }
    })

    // PID file so an external sampler (jstack loop) can find this JVM
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/profile_pid"),
      java.lang.ProcessHandle.current().pid().toString)
    val loops = sys.env.get("SPARK_GRAFT_PROFILE_LOOP").map(_.toInt).getOrElse(1)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // untimed: scratch builds, cache warm, JIT
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      (1 to loops).foreach(_ => fn(spark, sfDir).count())
      val wallMs = (System.nanoTime() - t0) / 1e6 / loops
      Thread.sleep(800) // drain the listener bus
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.filter(_.end > 0)
        .map(j => (j.end - j.start, j))
        .sortBy(-_._1)
      val jobSum = done.map(_._1).sum
      println(f"\n=== $name%s wall=${wallMs}%.0f ms jobs=${done.size}%d jobSum=${jobSum}%d ms driverGap=${wallMs - jobSum}%.0f ms")
      done.take(40).foreach { case (ms, j) =>
        println(f"  $ms%6d ms  ${j.site}%-45s ${j.desc.take(70)}%s")
      }
      println("  -- stages --")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_.ms).take(30).foreach { s =>
        println(f"  ${s.ms}%6d ms  ${s.tasks}%4d tasks ${s.metrics}%-30s ${s.name.take(80)}%s")
      }
    }
    spark.stop()
  }
}
