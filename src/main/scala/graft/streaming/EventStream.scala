package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming face of the event analytics family: the same
  * tumbling-window roll-up [[graft.operators.Temporal.tumblingCounts]]
  * computes in batch, declared as a streaming aggregation over
  * `readStream` with event-time `window()` + watermark — Spark keeps the
  * per-window partial aggregates as managed state, so an unbounded feed
  * runs in bounded memory (state ∝ open windows × event types, never
  * history).
  *
  * Output-mode contract (and why the spec uses Complete): with
  * Trigger.AvailableNow over a finite backlog, APPEND mode only emits
  * windows the final watermark has passed — the trailing window is
  * withheld, which is correct streaming semantics but cannot equal the
  * batch roll-up of the same files. Complete mode emits every open
  * window, so stream ≡ batch is assertable exactly; a production
  * append-mode deployment instead trades that trailing window for
  * monotone, re-emission-free output. Window starts are epoch-aligned by
  * `window()` exactly like the batch side's integer floor division, so
  * the two agree bit-for-bit on (win_start_us, n_events, value_cents). */
object EventStream {

  /** Streaming tumbling-window counts + exact cents per event type.
    * `schema` is the event table's schema (streams require one up
    * front); `watermark` bounds how late an event may arrive and still
    * be aggregated (state eviction horizon in append mode). */
  def windowedEventCounts(spark: SparkSession, path: String,
      schema: StructType, winDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      // the testdata writes ts as TIMESTAMP_NTZ; event-time watermarks
      // require TIMESTAMP, and the batch twin applies the same cast, so
      // both sides bucket identical instants
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), winDur))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("win_start_us"),
        col("n_events"), col("value_cents"))
}
