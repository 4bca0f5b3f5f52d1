package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming SCD2 — the always-on form of the batch q176
  * (`Advanced.stateHistory`): each user's event stream collapses into
  * state-run intervals ACROSS micro-batches, with one `ClosedRun`
  * emitted the moment a state CHANGES; the live (open) run is the
  * 28-byte typed state itself. A CDC consumer appending these rows
  * materializes the same history q176 computes by full recompute —
  * minus only the open tail, which by definition has no valid_to yet.
  *
  * Idempotency: state carries the last applied (ts, event_id); an event
  * at-or-before that watermark is a no-op, so replayed batches emit
  * nothing and count nothing twice (the Funnel strict-> rule, widened
  * to the composite key because equal-ts events are legal and ordered
  * by event_id — q176's exact tie rule). The same rule DROPS
  * out-of-order stragglers: this operator's contract is
  * arrival-order processing; a late-data-correct history is what the
  * batch q176 recompute is for.
  */
object StateTracker {

  final case class TrackEv(user_id: Long, event_type: String, ts: Timestamp,
      event_id: Long)
  final case class TrackState(state: String, sinceMs: Long, n: Long,
      lastMs: Long, lastId: Long)
  final case class ClosedRun(user_id: Long, state: String,
      valid_from: Timestamp, valid_to: Timestamp, n_events: Long)

  def runs(ds: Dataset[TrackEv]): Dataset[ClosedRun] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[TrackState, ClosedRun](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[TrackEv], state) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[ClosedRun]
          evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            if (st == null)
              st = TrackState(e.event_type, t, 1L, t, e.event_id)
            else if (t > st.lastMs ||
                (t == st.lastMs && e.event_id > st.lastId)) {
              if (e.event_type == st.state)
                st = st.copy(n = st.n + 1, lastMs = t, lastId = e.event_id)
              else {
                out += ClosedRun(uid, st.state, new Timestamp(st.sinceMs),
                  new Timestamp(t), st.n)
                st = TrackState(e.event_type, t, 1L, t, e.event_id)
              }
            } // else: replayed or out-of-order event — no-op by the rule
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
