package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming over the events table (beyond reference parity —
  * the reference is batch-only, SURVEY §2.2 "Streaming: no").
  *
  * Streams are the same declarative plans as batch: `readStream` on the
  * events schema → windowed aggregation with a watermark (bounded state) →
  * any sink. At cluster scale the aggregation state is hash-partitioned by
  * (window, event_type) across executors and checkpointed incrementally;
  * the watermark bounds state size regardless of input volume.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Per-user session state (public: the streaming state encoder's generated
    * code must be able to construct it). */
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** File-source stream over an events parquet directory (schema locked from
    * a batch peek — required by streaming sources).
    */
  def readEventStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = spark.read.parquet(path).schema
    graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(path))
  }

  /** Tumbling event-time window counts with a watermark: the streaming form
    * of Relational q18_time_window. Late data beyond the watermark is
    * dropped; state for closed windows is evicted.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Timestamp <-> epoch-micros (java.sql.Timestamp.getTime is only
    * millisecond-precision; event time here is microsecond).
    */
  private def toMicros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Per-user sessionization with an inactivity gap, via
    * flatMapGroupsWithState: custom state the built-in operators can't
    * express. State is ONE small record per user (bounded by user count).
    *
    * Emission semantics (deliberate, deterministic): a session is emitted
    * when a LATER event closes it; each user's final session stays in state
    * and is never emitted — mirroring the batch run of the same function,
    * which is what the specs compare against. A production deployment adds
    * GroupStateTimeout.ProcessingTimeTimeout to flush idle sessions; that
    * emission time is wall-clock-dependent, hence excluded here.
    *
    * Late events (event time before the state's last seen time) MERGE into
    * the open session — start/last move monotonically (min/max), so an
    * out-of-order event can never rewind the session and cause a spurious
    * split. Events later than the gap always open a new session. NOTE: this
    * merge applies even to an event gap-distant BEFORE the open session's
    * start, where a batch re-run over globally sorted input would emit a
    * separate session — the cross-batch divergence is pinned by
    * StreamingSpec ("gap-distant-EARLY late event").
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMillis * 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Events within a micro-batch arrive unordered: sort this batch.
          val sorted = it.toSeq.sortBy(e => toMicros(e.ts))
          var st = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            val t = toMicros(e.ts)
            st match {
              case null =>
                st = SessionState(t, t, 1, e.value)
              case s if t - s.last >= gapMicros =>
                closed += Session(userId, fromMicros(s.start),
                  fromMicros(s.last), s.n, s.total)
                st = SessionState(t, t, 1, e.value)
              case s =>
                // merge (incl. late events): bounds move monotonically
                st = SessionState(math.min(s.start, t), math.max(s.last, t),
                  s.n + 1, s.total + e.value)
            }
          }
          state.update(st)
          closed.iterator
      }
  }

  /** Per-user running totals state (public for the state encoder). */
  final case class RunningStats(n: Long, cents: Long)

  /** One emitted row per (user, micro-batch with input). */
  final case class UserRunning(user_id: Long, n_events: Long, sum_cents: Long)

  /** Spark 4 `transformWithState` processor (the arbitrary-stateful-
    * processing API that replaces flatMapGroupsWithState; requires the
    * RocksDB state store): a `ValueState` holding one small record per
    * user, folded with ORDER-INSENSITIVE ops (count, integer-cents sum) so
    * the per-batch iterator's nondeterministic order cannot change the
    * emission — each batch with input for a user emits that user's
    * cumulative totals. Value in integer cents, same rounding as the SQL
    * oracle's `round(value*100)` (both half-up for the positive domain).
    */
  final class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserRunning] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[RunningStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningStats]("agg",
        org.apache.spark.sql.Encoders.product[RunningStats], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      var n = 0L
      var cents = 0L
      rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
      val prev = if (state.exists()) state.get() else RunningStats(0L, 0L)
      val now = RunningStats(prev.n + n, prev.cents + cents)
      state.update(now)
      Iterator.single(UserRunning(key, now.n, now.cents))
    }
  }

  /** One emitted row per (user, micro-batch with input): how many DISTINCT
    * event types the user has produced so far. */
  final case class UserTypes(user_id: Long, n_types: Int)

  /** transformWithState with MAP state: event_type → count per user. The
    * per-batch emission reads only the map's SIZE (order-insensitive —
    * RocksDB iteration order never matters), so output is deterministic
    * under any within-batch row order. Demonstrates the keyed sub-state
    * shape ValueState can't: per-(user, type) entries individually
    * updatable without rewriting the whole record.
    */
  final class DistinctTypesProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTypes] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    // ValueState holding the whole type-SET (-joined, sorted), not a
    // MapState with one entry per type: the per-type counts were never read
    // (only the key-set size is emitted), and MapState pays a RocksDB
    // get+put PER EVENT where this pays one get per (user, batch) and one
    // put only when the set actually grew. Identical output multiset.
    @transient private var state: org.apache.spark.sql.streaming.ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[String]("types",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTypes] = {
      val packed = if (state.exists()) state.get() else ""
      var types: Set[String] =
        if (packed.isEmpty) Set.empty else packed.split('').toSet
      val before = types.size
      rows.foreach { e => types += e.event_type }
      if (types.size != before)
        state.update(types.toSeq.sorted.mkString(""))
      Iterator.single(UserTypes(key, types.size))
    }
  }

  /** Per-user CEP state for the streaming funnel: the latest `view`
    * timestamp seen, and the tightest chain's view (the latest view that
    * had a `click` after it). −1 = unset.
    */
  final case class FunnelState(lastView: Long, chainView: Long)

  /** One row per completed conversion (a qualifying `purchase`). */
  final case class Conversion(user_id: Long, purchase_us: Long, span_us: Long)

  /** Streaming SEQUENCE-PATTERN MATCH (CEP): the view → click → purchase
    * within-window funnel as per-key state — the same running-max
    * recurrence the batch gate expresses with two windows, folded
    * incrementally. State is two longs per user regardless of history
    * length; each batch's rows are sorted by (event-time, event_id) — the
    * same deterministic total order the batch windows use — and the
    * staging delivers batches in global event-time order, so the emitted
    * multiset equals the batch relation exactly. Emits on match (Update
    * mode), the Flink-CEP-style shape Spark lacks as a built-in.
    */
  final class FunnelProcessor(windowMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, Conversion] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Conversion] = {
      var s = if (state.exists()) state.get() else FunnelState(-1L, -1L)
      val out = Seq.newBuilder[Conversion]
      rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id)).foreach { e =>
        val tus = toMicros(e.ts)
        e.event_type match {
          case "view" =>
            if (tus > s.lastView) s = s.copy(lastView = tus)
          case "click" =>
            if (s.lastView > s.chainView) s = s.copy(chainView = s.lastView)
          case "purchase" if s.chainView >= 0 && tus - s.chainView <= windowMicros =>
            out += Conversion(key, tus, tus - s.chainView)
          case _ =>
        }
      }
      state.update(s)
      out.result().iterator
    }
  }

  /** Per-user retention state: first-event micros and the highest age-day
    * already emitted (−1 sentinels before any event). */
  final case class RetentionState(t0Micros: Long, maxAgeEmitted: Long)

  /** One emitted row per (user, NEW age-day) — the increment the cohort
    * matrix aggregates; `t0_us` rides along so the final aggregation can
    * derive the global cohort epoch (min t0) without a second state pass. */
  final case class RetentionHit(user_id: Long, t0_us: Long, age_day: Long)

  /** Streaming RETENTION-COHORT maintenance (round-10): per-user
    * ValueState = (first-seen time, highest age-day emitted) — two longs
    * regardless of history. Because the staging delivers batches in global
    * event-time order (and each batch is sorted by (ts, event_id)), a
    * user's first-ever event arrives first (t0 is final the moment it is
    * set) and age-days are non-decreasing — so emitting exactly when
    * `age > maxAgeEmitted` yields each occurring (user, age_day) ONCE:
    * the emitted multiset is precisely the batch gate's
    * DISTINCT-(user, age) relation, batch-equivalent by construction.
    */
  final class RetentionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, RetentionHit] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[RetentionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RetentionState]("ret",
        org.apache.spark.sql.Encoders.product[RetentionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[RetentionHit] = {
      val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else RetentionState(-1L, -1L)
      val out = Seq.newBuilder[RetentionHit]
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        if (st.t0Micros < 0) st = RetentionState(t, -1L)
        val age = (t - st.t0Micros) / 86400000000L // t >= t0 by arrival order
        if (age > st.maxAgeEmitted) {
          out += RetentionHit(key, st.t0Micros, age)
          st = st.copy(maxAgeEmitted = age)
        }
      }
      state.update(st)
      out.result().iterator
    }
  }

  /** The open SCD2 row per user — O(1) state for the CDC processor. */
  final case class ScdState(event_id: Long, event_type: String,
      value: Double, tus: Long)

  /** One change record: 'open' inserts a current row, 'close' stamps the
    * superseded row's valid_to. */
  final case class ScdChange(op: String, user_id: Long, event_id: Long,
      event_type: String, value: Double, valid_from_us: Long,
      valid_to_us: Option[Long])

  /** STREAMING SCD2 as a CDC stream (round-10): the warehouse
    * slowly-changing-dimension maintenance loop — each arriving event for
    * a user CLOSES the user's open row (emit its valid_to) and OPENS its
    * own (emit the insert). State is the single open row per user; the
    * emitted change stream, applied (close overrides open), reconstructs
    * the batch events_scd2 relation exactly — spec-pinned. Every change
    * is emitted exactly once; micros arithmetic end-to-end.
    */
  final class ScdCdcProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, ScdChange] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[ScdState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ScdState]("scd",
        org.apache.spark.sql.Encoders.product[ScdState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ScdChange] = {
      val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
      val out = Seq.newBuilder[ScdChange]
      var prev = if (state.exists()) Option(state.get()) else None
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        prev.foreach { p =>
          out += ScdChange("close", key, p.event_id, p.event_type,
            p.value, p.tus, Some(t))
        }
        out += ScdChange("open", key, e.event_id, e.event_type,
          e.value, t, None)
        prev = Some(ScdState(e.event_id, e.event_type, e.value, t))
      }
      prev.foreach(state.update)
      out.result().iterator
    }
  }

  /** Trailing-5-value ring for the anomaly processor: O(1) state per user
    * regardless of history — x1 oldest … x5 newest, n = values held. */
  final case class AnomState(n: Long, x1: Long, x2: Long, x3: Long,
      x4: Long, x5: Long)

  /** An event flagged >= 2 sigmas off its user's trailing window. */
  final case class AnomHit(event_id: Long, user_id: Long,
      value_cents: Long, zscore: Double)

  /** STREAMING anomaly detection (round-10): the events_anomaly rolling
    * z-score as transformWithState — per-user state is a 6-long ring (the
    * trailing 5 cents values), folded in (ts, event_id) order. The z
    * arithmetic is the batch gate's exact chain (integer moments, one
    * double division after one sqrt), so with globally time-ordered
    * staging the emitted flags are batch-equivalent BY CONSTRUCTION —
    * the oracle is the batch SQL verbatim. 100 TB shape: O(1) state per
    * key, one shuffle on user_id per batch, flags-only output.
    */
  final class AnomalyProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, AnomHit] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[AnomState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AnomState]("anom",
        org.apache.spark.sql.Encoders.product[AnomState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[AnomHit] = {
      val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else AnomState(0, 0, 0, 0, 0, 0)
      val out = Seq.newBuilder[AnomHit]
      sorted.foreach { e =>
        // the batch gate's cents projection: Spark SQL round(double) goes
        // through BigDecimal.valueOf (shortest decimal string) + HALF_UP —
        // math.round (floor(x+0.5)) differs on negative halves
        // magnitude bound: with |x| < B the WHOLE Long chain below is
        // exact — sxx ≤ 5B², the intermediates 5·sxx and sx² ≤ 25B², and
        // the worst term 5·(5·sxx − sx²) ≤ 125B² (since sx² ≥ 0), so
        // 125B² < 2^63 requires B ≤ 2.71e8 cents (~$2.7M). The previous
        // 1.3e9 bound only covered the FIRST products: sx reaches 6.5e9 so
        // sx² ≈ 4.2e19 > Long.MaxValue — a silent wraparound while the
        // batch DECIMAL oracle stayed exact. The batch SQL allows up to
        // 10^12 cents, so the streaming twin is the narrower contract
        // (assert, don't wrap).
        val x = java.math.BigDecimal.valueOf(e.value * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        require(math.abs(x) < 270000000L,
          s"anomaly cents $x exceeds the exact-Long moment bound (125*B*B < 2^63, B=2.7e8)")
        if (st.n == 5) {
          val sx = st.x1 + st.x2 + st.x3 + st.x4 + st.x5
          val sxx = st.x1 * st.x1 + st.x2 * st.x2 + st.x3 * st.x3 +
            st.x4 * st.x4 + st.x5 * st.x5
          if (5 * sxx > sx * sx) {
            // identical IEEE chain to the SQL readout: exact-int inputs,
            // one double division after one sqrt
            val z = (x * 5 - sx).toDouble /
              math.sqrt((5 * (5 * sxx - sx * sx)).toDouble / 4)
            if (math.abs(z) >= 2.0) out += AnomHit(e.event_id, key, x, z)
          }
        }
        st = AnomState(math.min(st.n + 1, 5), st.x2, st.x3, st.x4, st.x5, x)
      }
      state.update(st)
      out.result().iterator
    }
  }

  /** Exact-cents session state for the timer processor. */
  final case class TimerSessState(startMicros: Long, lastMicros: Long,
      n: Long, cents: Long)

  /** A session CLOSED by inactivity — last event ts, not end-of-gap. */
  final case class TimedSession(user_id: Long, session_start: Timestamp,
      session_last: Timestamp, n_events: Long, sum_cents: Long)

  /** transformWithState with EVENT-TIME TIMERS (round-7): sessionization
    * whose FINAL dangling sessions flush deterministically — the exact gap
    * the flatMapGroupsWithState sessionizer leaves (its oracle must
    * exclude each user's last session; this one's includes every session).
    *
    * Discipline: each input batch folds its rows into the session state
    * (closing a session inline when the gap is exceeded — emitted
    * immediately), then re-points ONE inactivity timer at the session's
    * current end (+gap): all previously registered timers are deleted, so
    * the only live timer always matches the live state. When the watermark
    * passes the timer, [[handleExpiredTimer]] emits the session and clears
    * state. Because the staging delivers files in global event-time order,
    * a timer can only fire once the session is genuinely un-extendable
    * (any future event would start a new session), so the emitted multiset
    * equals batch sessionization REGARDLESS of input-vs-timer processing
    * order within a batch. Exact integer cents (the RunningStats
    * discipline).
    */
  final class TimerSessionProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, TimedSession] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[TimerSessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TimerSessState]("sess",
        org.apache.spark.sql.Encoders.product[TimerSessState], TTLConfig.NONE)

    private def emit(key: Long, s: TimerSessState): TimedSession =
      TimedSession(key, fromMicros(s.startMicros), fromMicros(s.lastMicros),
        s.n, s.cents)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TimedSession] = {
      val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
      var st: TimerSessState = if (state.exists()) state.get() else null
      val closed = scala.collection.mutable.ArrayBuffer.empty[TimedSession]
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        val cents = math.round(e.value * 100)
        st match {
          case null => st = TimerSessState(t, t, 1, cents)
          case s if t - s.lastMicros >= gapMicros =>
            closed += emit(key, s)
            st = TimerSessState(t, t, 1, cents)
          case s =>
            st = TimerSessState(math.min(s.startMicros, t),
              math.max(s.lastMicros, t), s.n + 1, s.cents + cents)
        }
      }
      state.update(st)
      // re-point the single inactivity timer at the (possibly extended) end
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(st.lastMicros / 1000 + gapMicros / 1000)
      closed.iterator
    }

    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TimedSession] = {
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(emit(key, s))
      } else Iterator.empty
    }
  }

  /** Batch-mode sessionization with the built-in session_window — the
    * declarative equivalent (works in streaming with a watermark too).
    */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("total_value"))
}
