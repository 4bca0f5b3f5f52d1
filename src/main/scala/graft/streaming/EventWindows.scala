package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming event-time path (SURVEY.md §2B Q24 streaming
  * form): tumbling windows with watermark-based late-data handling.
  *
  * The batch bucket form (`queries.Relational` q24_event_buckets) is the
  * hash-matched artifact; these transforms run the SAME aggregation over
  * a stream so StreamingSpec can assert batch/stream equivalence and
  * that events later than the watermark are dropped. The transform is
  * source-agnostic: it works on a MemoryStream DataFrame in tests and a
  * file-source stream on a landing prefix in production (the streaming
  * successor of the reference's per-day ingest loop).
  */
object EventWindows {

  /** 5-minute tumbling window counts over event-time `ts`. For a
    * streaming input, `withWatermark` bounds state: windows older than
    * the watermark are finalized and dropped from the store — this is
    * what makes the aggregation runnable forever at 100 TB/day.
    */
  def tumblingCounts(events: DataFrame,
      windowLength: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n"))
  }

  /** The q24 bucket spelling (epoch-seconds div 300) for equivalence
    * checks between the window() form and the batch oracle form.
    */
  def bucketCounts(events: DataFrame): DataFrame =
    events
      .groupBy(floor(unix_timestamp(col("ts")) / 300).as("bucket"))
      .agg(count(lit(1)).as("n"))
}
