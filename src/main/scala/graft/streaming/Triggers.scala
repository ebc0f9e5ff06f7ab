package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

import graft.functions.CombineFn

/** Trigger engine with pane metadata — the port of the reference's
  * ReduceFnRunner + trigger state machines
  * (reference: RCORE/ReduceFnRunner.java:89 — active-window tracking,
  * firing, GC at window.maxTimestamp + allowedLateness;
  * RCORE/triggers/AfterWatermarkStateMachine.java,
  * AfterPaneStateMachine.java; pane bookkeeping
  * SDK/transforms/windowing/PaneInfo.java: index, EARLY/ON_TIME/LATE,
  * isFirst/isLast).
  *
  * Spark's built-in streaming aggregation covers DefaultTrigger append
  * (final pane) and update (refinements) — this operator exists for what
  * those modes cannot express: pane indices and timing labels, element-count
  * early firings (AfterPane.elementCountAtLeast), discarding-mode per-pane
  * deltas, and ClosingBehavior/OnTimeBehavior control.
  *
  * Execution shape: elements are window-assigned up front (Beam assigns
  * windows eagerly too — WindowedValue carries them), then keyed by
  * (userKey, windowStart) so per-(key, window) state matches Beam's state
  * namespaces (RCORE/StateNamespaces.java). Two event-time timers per
  * window: end-of-window (ON_TIME firing) and end + allowedLateness (final
  * firing + state GC).
  */
object Triggers {

  /** Firing condition before the watermark reaches end-of-window
    * (reference: AfterWatermark.java:76 withEarlyFirings,
    * AfterPane.java:31). */
  sealed trait EarlyFiring
  case object NoEarlyFiring extends EarlyFiring
  /** Fire on every micro-batch that saw input for the window —
    * AfterWatermark.withEarlyFirings(AfterProcessingTime...) at micro-batch
    * cadence. */
  case object EveryBatch extends EarlyFiring
  /** AfterPane.elementCountAtLeast(n). */
  final case class AfterCount(n: Int) extends EarlyFiring

  final case class TriggerConfig(
      windowSizeMs: Long,
      allowedLatenessMs: Long = 0L,
      early: EarlyFiring = NoEarlyFiring,
      /** fire a pane per micro-batch for late (post-on-time) input */
      lateFirings: Boolean = true,
      /** ACCUMULATING vs DISCARDING fired panes (WindowingStrategy.java:50) */
      accumulating: Boolean = true,
      /** OnTimeBehavior.FIRE_ALWAYS: emit the on-time pane even when empty
        * (WindowingStrategy.java:106) */
      onTimeAlways: Boolean = true)

  /** One fired pane: (key, windowStart, windowEnd, value, paneIndex,
    * timing, isFinal). timing ∈ EARLY | ON_TIME | LATE. */
  type Pane[K, OUT] = (K, Long, Long, OUT, Int, String, Boolean)

  private val ON_TIME = "ON_TIME"; private val EARLY = "EARLY"; private val LATE = "LATE"

  /** The ReduceFnRunner analogue for one (key, window). */
  private class TriggerProcessor[K, V, ACC, OUT](
      fn: CombineFn[V, ACC, OUT], cfg: TriggerConfig)(
      implicit accEnc: Encoder[ACC], outEnc: Encoder[Pane[K, OUT]])
      extends StatefulProcessor[(K, Long), (K, Long, V), Pane[K, OUT]] {

    @transient private var acc: ValueState[ACC] = _
    @transient private var paneIndex: ValueState[Int] = _
    @transient private var sinceLastFire: ValueState[Long] = _
    @transient private var timersSet: ValueState[Boolean] = _

    override def init(om: OutputMode, tm: TimeMode): Unit = {
      acc = getHandle.getValueState[ACC]("acc", accEnc, TTLConfig.NONE)
      paneIndex = getHandle.getValueState[Int]("paneIndex", Encoders.scalaInt, TTLConfig.NONE)
      sinceLastFire = getHandle.getValueState[Long]("sinceLastFire", Encoders.scalaLong, TTLConfig.NONE)
      timersSet = getHandle.getValueState[Boolean]("timersSet", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    private def windowEnd(wstart: Long): Long = wstart + cfg.windowSizeMs
    private def gcTime(wstart: Long): Long = windowEnd(wstart) + cfg.allowedLatenessMs

    private def fire(key: (K, Long), timing: String, isFinal: Boolean): Iterator[Pane[K, OUT]] = {
      val idx = if (paneIndex.exists()) paneIndex.get() else 0
      val a = if (acc.exists()) acc.get() else fn.createAccumulator()
      paneIndex.update(idx + 1)
      sinceLastFire.update(0L)
      if (!cfg.accumulating) acc.update(fn.createAccumulator()) // discarding: emit delta
      Iterator((key._1, key._2, windowEnd(key._2), fn.extractOutput(a), idx, timing, isFinal))
    }

    override def handleInputRows(key: (K, Long), rows: Iterator[(K, Long, V)],
                                 tv: TimerValues): Iterator[Pane[K, OUT]] = {
      val wm = tv.getCurrentWatermarkInMs()
      // too-late data: beyond GC horizon → dropped
      // (reference: RCORE/LateDataDroppingDoFnRunner.java)
      if (wm >= gcTime(key._2)) return Iterator.empty

      var a = if (acc.exists()) acc.get() else fn.createAccumulator()
      var n = if (sinceLastFire.exists()) sinceLastFire.get() else 0L
      var count = 0L
      rows.foreach { r => a = fn.addInput(a, r._3); count += 1 }
      acc.update(a); n += count; sinceLastFire.update(n)

      if (!(if (timersSet.exists()) timersSet.get() else false)) {
        getHandle.registerTimer(windowEnd(key._2))
        if (cfg.allowedLatenessMs > 0) getHandle.registerTimer(gcTime(key._2))
        timersSet.update(true)
      }

      val onTimeFired = wm >= windowEnd(key._2)
      if (onTimeFired) {
        // post-on-time input within lateness → LATE pane per batch
        if (cfg.lateFirings && count > 0) fire(key, LATE, isFinal = false)
        else Iterator.empty
      } else cfg.early match {
        case EveryBatch if count > 0          => fire(key, EARLY, isFinal = false)
        case AfterCount(k) if n >= k          => fire(key, EARLY, isFinal = false)
        case _                                => Iterator.empty
      }
    }

    override def handleExpiredTimer(key: (K, Long), tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Pane[K, OUT]] = {
      val expiry = info.getExpiryTimeInMs()
      if (expiry == windowEnd(key._2)) {
        val isFinal = cfg.allowedLatenessMs == 0
        val pending = if (sinceLastFire.exists()) sinceLastFire.get() else 0L
        val out =
          if (cfg.onTimeAlways || pending > 0) fire(key, ON_TIME, isFinal)
          else Iterator.empty[Pane[K, OUT]]
        if (isFinal) clearAll()
        out
      } else {
        // GC timer: final pane only if data arrived since the last firing
        // (ClosingBehavior.FIRE_IF_NON_EMPTY, WindowingStrategy.java:105)
        val pending = if (sinceLastFire.exists()) sinceLastFire.get() else 0L
        val out =
          if (pending > 0) fire(key, LATE, isFinal = true)
          else Iterator.empty[Pane[K, OUT]]
        clearAll()
        out
      }
    }

    private def clearAll(): Unit = {
      acc.clear(); paneIndex.clear(); sinceLastFire.clear(); timersSet.clear()
    }
  }

  /** Triggered fixed-window aggregation with pane metadata. `assigned` must
    * be (key, windowStartMs, value) with a watermark declared upstream
    * (use [[assignFixedWindows]]). */
  def triggeredAggregate[K, V, ACC, OUT](
      assigned: Dataset[(K, Long, V)], fn: CombineFn[V, ACC, OUT], cfg: TriggerConfig)(
      implicit kEnc: Encoder[(K, Long)], accEnc: Encoder[ACC],
      outEnc: Encoder[Pane[K, OUT]]): Dataset[Pane[K, OUT]] = {
    Stateful.requireRocksDBStateStore(assigned.sparkSession)
    assigned.groupByKey(r => (r._1, r._2))
      .transformWithState(new TriggerProcessor[K, V, ACC, OUT](fn, cfg),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Fixed-window assignment (FixedWindows.java:36): wstart =
    * floor(ts / size) * size, carried next to the key — Beam's eager window
    * assignment (Window.Assign). */
  def assignFixedWindows[K, V](ds: Dataset[(K, java.sql.Timestamp, V)], sizeMs: Long)(
      implicit outEnc: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] =
    ds.map { case (k, ts, v) =>
      val t = ts.getTime
      (k, math.floorDiv(t, sizeMs) * sizeMs, v)
    }
}
