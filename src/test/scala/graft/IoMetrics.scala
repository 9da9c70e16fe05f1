package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graft.TestShim
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Input-metrics capture for scale assertions ("this operation read only
  * X"): records read from files by every task launched inside `body`.
  */
object IoMetrics {
  def recordsReadDuring[T](spark: SparkSession)(body: => T): (T, Long) = {
    val acc = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    TestShim.drainListenerBus(spark.sparkContext) // settle earlier work
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      TestShim.drainListenerBus(spark.sparkContext)
      (r, acc.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
