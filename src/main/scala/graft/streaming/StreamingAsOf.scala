package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the ingest-time twin of
  * [[graft.operators.AsOfJoin]]: a stream of left events is enriched with
  * the latest right-side row seen for its key, via
  * `flatMapGroupsWithState` over the tagged UNION of both streams.
  *
  * Semantics (documented, not accidental):
  *  - within a micro-batch, rows apply in event-time order with right
  *    rows before left rows at equal times — the batch operator's
  *    inclusive bound;
  *  - the emitted match always satisfies `right.t <= left.t`: a left row
  *    arriving LATE (older than the key's current state) gets NO match
  *    rather than a match from its future. Exact event-time as-of over
  *    late data belongs to the batch operator on the landed table — the
  *    same realtime/batch split as [[StreamingDedup]];
  *  - state is ONE (time, payload) per key — O(live keys), not O(rows).
  *    Idle-key EVICTION is deliberately not wired here:
  *    `GroupStateTimeout.ProcessingTimeTimeout` livelocks this Spark
  *    build's streaming checkpoint manager (tasks park forever in
  *    `ChecksumCheckpointFileManager.awaitResult`, observed with both 1 s
  *    and 1 h TTLs), so bounding state for an unbounded key domain
  *    belongs to the deployment: the RocksDB state store (spills past
  *    memory) or Spark's `transformWithState` TTL once available in the
  *    target runtime. For bounded key domains (users, devices, spaces)
  *    the per-key state is already the floor.
  */
object StreamingAsOf {

  /** Tagged input row: `isLeft = false` rows update per-key state,
    * `isLeft = true` rows emit enriched output.
    */
  case class In(key: Long, t: Long, isLeft: Boolean, payload: String)

  /** Enriched left event; `rT`/`rPayload` are None when no right row at
    * or before `t` is known.
    */
  case class Out(key: Long, t: Long, payload: String,
      rT: Option[Long], rPayload: Option[String])

  /** Per-key state: the latest right row. Public — the state encoder's
    * generated code constructs it reflectively.
    */
  case class RState(t: Long, payload: String)

  def enrich(in: Dataset[In]): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[RState, Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[In], state: GroupState[RState]) =>
          // event-time order; right (false) sorts before left at ties
          val sorted = rows.toSeq.sortBy(r => (r.t, r.isLeft))
          val out = Seq.newBuilder[Out]
          var st = state.getOption
          sorted.foreach { r =>
            if (!r.isLeft) {
              if (st.forall(_.t <= r.t)) st = Some(RState(r.t, r.payload))
            } else {
              val m = st.filter(_.t <= r.t)
              out += Out(key, r.t, r.payload, m.map(_.t), m.map(_.payload))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
