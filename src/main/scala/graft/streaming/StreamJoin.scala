package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution primitive (each click
  * joined to the same user's views in the preceding window) expressed as
  * Structured Streaming's watermarked inner join, the canonical form the
  * engine's batch range join (q47) takes when BOTH sides are unbounded.
  *
  * Why the shape matters at scale: a watermark on BOTH sides plus the
  * time-interval join condition is exactly what lets the state store
  * evict — each side buffers only rows younger than
  * (watermark − interval), so state is bounded by rate × window, not by
  * stream length. Without the interval bound (or with only one
  * watermark) Spark must keep every row forever and the join is a slow
  * memory leak. The join itself shuffles both sides by user_id once per
  * micro-batch; matches are emitted append-mode as soon as the
  * watermark passes the click's window (no update churn downstream).
  *
  * The same plan runs UNCHANGED on batch frames (watermarks are no-ops
  * there), which is what StreamJoinSpec pins: streamed output ==
  * batch join on the on-time subset.
  */
object StreamJoin {

  /** Inner-join each click to the same user's views with
    * `cts − within ≤ vts ≤ cts`. Schemas: views (v_user, vts),
    * clicks (c_user, cts, click_id). Both sides watermarked at
    * `watermark` so join state evicts.
    */
  def attributed(views: DataFrame, clicks: DataFrame,
      within: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("vts", watermark)
    val c = clicks.withWatermark("cts", watermark)
    c.join(v,
      expr(s"""v_user = c_user AND
               vts <= cts AND
               vts >= cts - INTERVAL $within"""))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("cts"), col("vts"))
  }
}
