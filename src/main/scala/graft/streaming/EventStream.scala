package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming event aggregation: watermark + event-time tumbling
  * windows. The same transform works on a batch DataFrame (windows compute
  * identically), which is how the batch oracle query and the streaming spec
  * share semantics.
  *
  * At scale this is the canonical streaming shape: state is bounded by the
  * watermark (late data beyond `watermark` is dropped, closed windows are
  * evicted from the state store), and the only shuffle is the hash
  * partition on (window, event_type).
  */
object EventStream {

  /** Tumbling-window counts and value sums per event type. `events` may be
    * a streaming or batch DataFrame with (ts: timestamp, event_type,
    * value: double).
    */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }
}
