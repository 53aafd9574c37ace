package graft.streaming

import graft.Det
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event row as fed from a stream source (same fields `Tables.events`
  * derives for batch: exact epoch-µs plus its timestamp form). */
final case class Ev(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, value: Double)

/** Latest-event state kept per (user_id, event_type) by the streaming
  * dedup (CDC "keep latest" — the streaming twin of events_dedup_latest). */
final case class LatestEv(user_id: Long, event_type: String,
    event_id: Long, ts_us: Long, value: Double)

/** Structured Streaming twins of the §2.1-H batch operators
  * (SURVEY §2.9 / §7.1 slice 5).
  *
  * These are NOT in [[graft.Registry]]: Verify/t2 is batch-only, and
  * streaming session semantics differ from the batch gap-algebra on late
  * data. They share the same column contract as their batch twins, so a
  * caller can swap `spark.read` for `spark.readStream` and keep the rest
  * of the pipeline. Consistency with the batch twins on in-order input is
  * covered by StreamingSpec (MemoryStream → memory sink).
  *
  * Scale notes: all three are single-shuffle stateful aggregations keyed
  * by (window×type) / (user, session) / (user, type); state size is
  * O(active keys), watermarks bound it in event time.
  */
object StreamOps {

  private def withEventTime(events: Dataset[Ev]): DataFrame =
    events.withColumn("ts_t", timestamp_micros(col("ts_us")))

  /** Per 1-hour tumbling window × event_type: count + exact value sum.
    * Streaming twin of `events_tumbling_window`. */
  def tumblingCounts(events: Dataset[Ev]): DataFrame =
    withEventTime(events)
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("value"), 2).as("sum_value"))
      .select(Det.second(col("w.start")).as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Gap-based sessions via `session_window` (30-min inactivity), the
    * streaming twin of `events_sessionization`'s window algebra. */
  def sessionCounts(events: Dataset[Ev]): DataFrame =
    withEventTime(events)
      .withWatermark("ts_t", "2 hours")
      .groupBy(col("user_id"),
        session_window(col("ts_t"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("ev_cnt"), Det.dsum(col("value"), 2)
        .as("sum_value"))
      .select(col("user_id"), Det.second(col("sw.start")).as("session_start"),
        col("ev_cnt"), col("sum_value"))

  /** CDC keep-latest per (user_id, event_type) with explicit state
    * (`mapGroupsWithState`) — the streaming twin of `events_dedup_latest`,
    * and the engine's demonstration of arbitrary stateful processing. */
  def latestPerKey(events: Dataset[Ev]): Dataset[LatestEv] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LatestEv, LatestEv](
        GroupStateTimeout.NoTimeout) {
        case ((uid, etype), batch, state: GroupState[LatestEv]) =>
          val incoming = batch.maxBy(e => (e.ts_us, e.event_id))
          val best = state.getOption match {
            case Some(prev) if prev.ts_us > incoming.ts_us
              || (prev.ts_us == incoming.ts_us
                && prev.event_id > incoming.event_id) => prev
            case _ => LatestEv(uid, etype, incoming.event_id,
              incoming.ts_us, incoming.value)
          }
          state.update(best)
          best
      }
  }
}
