package graft

import org.apache.spark.sql.SparkSession
import graft.core._

/** Manual end-to-end probe of the library's guard rails (error paths,
  * empty-match shape, plan pruning) — run: sbt "Test/runMain graft.ProbeMain"
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def expectErr(tag: String)(f: => Any): Unit =
      try { f; println(s"$tag NO-ERROR (BAD)") }
      catch { case e: Exception => println(s"$tag rejected: ${e.getMessage.linesIterator.next()}") }

    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    expectErr("P1")(Fetch.fetch(spark, "/tmp/none", Seq(ColFilter("l_linenumber", ">", Seq(1, 2)))))
    expectErr("P2")(Fetch.fetch(spark, "/tmp/none", Seq(ColFilter("a", "~=", Seq(1)))))
    Publish.publish(spark, df, "/tmp/probe_ds", Seq("l_returnflag"))
    val empty = Fetch.fetch(spark, "/tmp/probe_ds", Seq(ColFilter("l_returnflag", "==", Seq("ZZZ"))))
    println(s"P3 empty-match rows=${empty.count()} cols=${empty.columns.length} firstCol=${empty.columns.head}")
    expectErr("P4")(Fetch.fetch(spark, "/tmp/probe_ds", Seq(ColFilter("l_quantity", "==", Seq(1.0)))))
    df.limit(10).write.mode("overwrite").parquet("/tmp/probe_plain")
    expectErr("P5")(Fetch.fetch(spark, "/tmp/probe_plain", Nil, acceptNotGraft = false))
    println("P6 foreign-read rows=" + Fetch.fetch(spark, "/tmp/probe_plain").count())
    expectErr("P7")(Publish.publish(spark, df.limit(0), "/tmp/probe_empty", Nil))
    expectErr("P8")(Publish.publish(spark, df.withColumnRenamed("l_returnflag", "ORDER"), "/tmp/probe_res", Seq("ORDER")))
    val pruned = Fetch.fetch(spark, "/tmp/probe_ds", Seq(ColFilter("l_returnflag", "==", Seq("R"))))
    val plan = pruned.queryExecution.executedPlan.toString
    println("P9 PartitionFilters-nonempty=" + raw"PartitionFilters: \[[^\]]".r.findFirstIn(plan).isDefined)
    println("P10 entry rows=" + SparkEntry.entry(spark).count())
    expectErr("P11")(Fetch.getMaxPartitionValue(spark, "/tmp/probe_ds", "l_returnflag"))
    println("P12 empty-all=" + Fetch.getAllPartitionValues(spark, "/tmp/no_such_ds", "p"))
    println("P13 empty-diff-rev=" + Fetch.getDiffPartitionValues(spark, "/tmp/no_such_ds", "p", Seq(1, 2, 2), reverse = true).sortBy(_.toString))
    println("P14 empty-max=" + Fetch.getMaxPartitionValue(spark, "/tmp/no_such_ds", "p"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val payload = graft.ops.Multimodal.attachPayload(docs)
    println("P15 resize max dims=" + graft.ops.Multimodal.resizeMeta(
      graft.ops.Multimodal.extractMeta(payload), 64)
      .agg(org.apache.spark.sql.functions.max("width"),
        org.apache.spark.sql.functions.max("height")).collect().head)
    println("P16 frames rows=" + graft.ops.Multimodal.sampleFrames(payload, 3).count())
    println("P17 features dim=" + graft.ops.Multimodal.extractFeatures(payload, 8)
      .selectExpr("size(features)").distinct().collect().toSeq)
    val dsRoot = "/tmp/probe_stream_ds"
    Publish.publish(spark, docs, dsRoot, Nil)
    val sq = graft.streaming.EventStream.streamDataset(spark, dsRoot)
      .writeStream.format("memory").queryName("probe_ds")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    sq.awaitTermination(60000)
    println("P18 streamed rows=" + spark.table("probe_ds").count())
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val sinkRoot = "/tmp/probe_stream_sink"
    val probeFs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    probeFs.delete(new org.apache.hadoop.fs.Path(sinkRoot), true)
    probeFs.delete(new org.apache.hadoop.fs.Path("/tmp/probe_stream_sink_ckpt"), true)
    val sq2 = graft.streaming.EventStream.streamToDataset(spark,
      ms.toDF().toDF("id", "grp"), sinkRoot, Seq("grp"), "/tmp/probe_stream_sink_ckpt")
    ms.addData((1L, "x"), (2L, "y"))
    sq2.processAllAvailable(); sq2.stop()
    println("P19 sink-fetch rows=" + Fetch.fetch(spark, sinkRoot).count() +
      " parts=" + Fetch.getAllPartitionValues(spark, sinkRoot, "grp").map(_.toString).sorted.mkString(","))
    // round-4 guard rails
    expectErr("P20")(graft.ops.BloomPrune.pruneJoin(
      Seq(1L).toDF("k"), Seq(1).toDF("j"), "k", "j")) // key-type mismatch
    val clobberRoot = "/tmp/probe_clobber"
    probeFs.delete(new org.apache.hadoop.fs.Path(clobberRoot), true)
    spark.range(0, 3).toDF("id").write.parquet(clobberRoot) // data, no sidecar
    expectErr("P21")(Publish.publishDedupAppend(
      spark, spark.range(0, 2).toDF("id"), clobberRoot, Seq("id")))
    expectErr("P22")(Fetch.fetchIndexed(spark, "/tmp/probe_ds",
      dataFilters = Seq(ColFilter("l_returnflag", "==", Seq("R"))))) // partition col as data filter
    expectErr("P23")(Publish.publish(spark, df, "/tmp/probe_zbad", Nil,
      zorderCols = Seq("l_quantity"), sortCols = Seq("l_quantity"))) // both clusterings
    locally { // partitioned bloom pruning keeps its semantic join-type guard
      import spark.implicits._
      val small = Seq((1, 1L)).toDF("p", "k")
      val large = Seq((1, 1L)).toDF("p", "k")
      expectErr("P24")(graft.ops.BloomPrune.pruneJoinPartitioned(
        large, small, "p", "k", "p", "k", joinType = "left_outer"))
      // partition columns carry no data stats (they prune directly)
      expectErr("P25")(StatsIndex.build(spark, "/tmp/probe_ds", Seq("l_returnflag")))
    }
    locally { // sink-manifest guard rails
      // a typo'd root fails fast with NO filesystem mutation (build must
      // not mkdirs before validating metadata)
      val typoRoot = "/tmp/probe_no_such_dataset"
      probeFs.delete(new org.apache.hadoop.fs.Path(typoRoot), true)
      expectErr("P26")(StatsIndex.build(spark, typoRoot, Seq("v")))
      if (probeFs.exists(new org.apache.hadoop.fs.Path(typoRoot)))
        println("P26b NO-ERROR (BAD): build left a directory behind on a missing dataset")
      else println("P26b OK")
      // a versionless marker write on a sink root is refused: the claim
      // would be untrustworthy the moment the next micro-batch commits
      val sinkRoot = "/tmp/probe_sink_root"
      probeFs.delete(new org.apache.hadoop.fs.Path(sinkRoot), true)
      probeFs.mkdirs(new org.apache.hadoop.fs.Path(sinkRoot, "_spark_metadata"))
      StatsIndex.writeMarker(spark, sinkRoot, Seq("v")) // must silently refuse
      if (StatsIndex.manifestColumns(spark, sinkRoot).isDefined)
        println("P27 NO-ERROR (BAD): versionless completeness claim on a sink root")
      else println("P27 OK")
    }
    locally { // row-level mutation guard rails
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      val unv = "/tmp/probe_mut_unversioned"
      probeFs.delete(new org.apache.hadoop.fs.Path(unv), true)
      graft.core.Publish.publish(spark, Seq((1L, "a")).toDF("id", "g"), unv, Seq("g"))
      expectErr("P28")(graft.core.Mutations.deleteWhere(spark, unv, col("id") > 0))
      val v = "/tmp/probe_mut_versioned"
      probeFs.delete(new org.apache.hadoop.fs.Path(v), true)
      graft.core.Publish.publishVersioned(spark,
        Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "x"), v, Seq("g"))
      // MERGE with duplicate source keys is ambiguous — rejected up front
      expectErr("P29")(graft.core.Mutations.merge(spark, v,
        Seq((1L, "a", 9.0), (1L, "a", 8.0)).toDF("id", "g", "x"), Seq("id")))
      // UPDATE cannot reassign a partition column
      expectErr("P30")(graft.core.Mutations.updateWhere(spark, v,
        lit(true), Map("g" -> lit("z"))))
      // MERGE source schema must equal the dataset's
      expectErr("P31")(graft.core.Mutations.merge(spark, v,
        Seq((1L, "a")).toDF("id", "g"), Seq("id")))
    }
    spark.stop()
  }
}
