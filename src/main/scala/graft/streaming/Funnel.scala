package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming funnel — the incremental form of the batch q150: each
  * user's strictly-ordered stage chain (view → click after it →
  * purchase after that) advanced ACROSS micro-batches in typed state.
  *
  * Per batch the group folds only its own events (sorted — per-user
  * per-batch groups are bounded), resuming from the stored (stage,
  * reached-at) pair, and emits one row per NEWLY reached stage. An
  * event can only advance the chain with a timestamp STRICTLY after
  * the previous stage's — so replays of already-counted events and
  * out-of-order stragglers older than the current stage are no-ops by
  * construction, the property that makes the fold idempotent without
  * any dedup state. State is 12 bytes per live user.
  *
  * FunnelSpec pins: streamed stage rows across split batches ==
  * the batch chain on the union.
  */
object Funnel {

  final case class FunnelEv(user_id: Long, event_type: String, ts: Timestamp)
  final case class FunnelState(stage: Int, atMs: Long)
  final case class StageReached(user_id: Long, stage: Int, at: Timestamp)

  def stages(ds: Dataset[FunnelEv],
      order: Seq[String] = Seq("view", "click", "purchase")): Dataset[StageReached] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[FunnelEv], state) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[StageReached]
          // event-time order inside the batch; the strict > rule makes
          // re-delivery and pre-stage stragglers no-ops
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (st.stage < order.length &&
                e.event_type == order(st.stage) &&
                e.ts.getTime > st.atMs) {
              st = FunnelState(st.stage + 1, e.ts.getTime)
              out += StageReached(uid, st.stage, e.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
