package graft

import org.apache.spark.sql.SparkSession

/** Debug/inspection main: print the executed plan of the pushed-aggregate
  * cell (complete pushdown = a Project over the one-row scan; a
  * HashAggregate pair means Spark fell back to partial pushdown).
  */
object ProbeAggPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("fetch_agg_pushdown")(spark, "/root/testdata/sf0.001")
    df.collect()
    println("== OPTIMIZED ==")
    println(df.queryExecution.optimizedPlan.toString)
    println("== EXECUTED ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
