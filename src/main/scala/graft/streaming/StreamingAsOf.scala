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
  *    Idle-key EVICTION: [[enrich]] keeps state forever (`NoTimeout`) —
  *    `GroupStateTimeout.ProcessingTimeTimeout` livelocks this Spark
  *    build's streaming checkpoint manager (tasks park forever in
  *    `ChecksumCheckpointFileManager.awaitResult`, observed with both 1 s
  *    and 1 h TTLs). [[enrichWithTtl]] bounds state for unbounded key
  *    domains through the path that DOES work: an event-time WATERMARK
  *    plus `EventTimeTimeout` — keys idle past the TTL are dropped when
  *    the watermark passes, driven by data progress rather than the
  *    broken wall-clock timer.
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

  /** Watermarked input row for [[enrichWithTtl]]; `ts` mirrors `t`
    * (treated as epoch millis) as a timestamp column for the watermark.
    */
  case class InT(key: Long, t: Long, isLeft: Boolean, payload: String,
      ts: java.sql.Timestamp)

  /** One micro-batch step for a key: apply rows in event-time order
    * (right before left at ties), update state to the latest right row,
    * emit enriched left rows.
    */
  private def step(key: Long, evs: Seq[(Long, Boolean, String)],
      state: GroupState[RState]): Iterator[Out] = {
    val sorted = evs.sortBy(e => (e._1, e._2))
    val out = Seq.newBuilder[Out]
    var st = state.getOption
    sorted.foreach { case (t, isLeft, payload) =>
      if (!isLeft) {
        if (st.forall(_.t <= t)) st = Some(RState(t, payload))
      } else {
        val m = st.filter(_.t <= t)
        out += Out(key, t, payload, m.map(_.t), m.map(_.payload))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  def enrich(in: Dataset[In]): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[RState, Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[In], state: GroupState[RState]) =>
          step(key, rows.map(r => (r.t, r.isLeft, r.payload)).toSeq, state)
      }
  }

  /** [[enrich]] with bounded state: `t` is interpreted as epoch millis,
    * the stream is watermarked by `watermarkDelay`, and a key whose last
    * event is more than `idleTtlMs` behind the watermark has its state
    * EVICTED (event-time timeout — the timer that works on this build;
    * see the object scaladoc). A left row for an evicted key starts over
    * with no match — the same contract as a never-seen key.
    */
  def enrichWithTtl(in: Dataset[In], watermarkDelay: String,
      idleTtlMs: Long): Dataset[Out] = {
    require(idleTtlMs > 0, s"idleTtlMs must be positive: $idleTtlMs")
    import in.sparkSession.implicits._
    in.withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("t")))
      .withWatermark("ts", watermarkDelay)
      .as[InT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[RState, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[InT], state: GroupState[RState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = rows.map(r => (r.t, r.isLeft, r.payload)).toSeq
            val out = step(key, evs, state)
            if (state.exists) {
              // timeout must stay ahead of the current watermark, even
              // for a batch made entirely of late rows
              val maxT = evs.iterator.map(_._1).max
              state.setTimeoutTimestamp(
                math.max(maxT + idleTtlMs, state.getCurrentWatermarkMs + 1))
            }
            out
          }
      }
  }
}
