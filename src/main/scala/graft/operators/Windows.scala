package graft.operators

import graft.GraftSession
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (reference: SDK/transforms/windowing/ — FixedWindows
  * .java:36, SlidingWindows.java:43, Sessions.java:40, GlobalWindows.java:32,
  * CalendarWindows.java:96/:198/:314; strategy object
  * SDK/values/WindowingStrategy.java:45).
  *
  * Beam assigns windows eagerly per element (WindowedValue carries the window
  * set); Spark defers window assignment to aggregation time. We mirror Beam's
  * model by carrying a WindowingStrategy alongside the frame and emitting the
  * right `window()` / `session_window()` / calendar expression when an
  * aggregation is applied — Catalyst then plans the stateful agg (streaming)
  * or plain hash agg (batch) with partial aggregation and no extra shuffle.
  */
object Windows {

  sealed trait WindowFn
  case object GlobalWindows extends WindowFn
  /** Tumbling (reference: FixedWindows.java:36). */
  final case class FixedWindows(size: String, offset: String = "0 seconds") extends WindowFn
  /** Sliding: element lands in size/period windows — Spark's window() emits
    * one row per overlapping window, matching Beam's multi-window membership
    * (reference: SlidingWindows.java:43). */
  final case class SlidingWindows(size: String, period: String) extends WindowFn
  /** Merging gap sessions per key (reference: Sessions.java:40). */
  final case class Sessions(gap: String) extends WindowFn
  /** Calendar-aligned, variable-length windows — full parity with the
    * reference's CalendarWindows.java:
    *  - days(n)                        → CalendarWindows("day", n)
    *  - weeks(n, startDayOfWeek)       → CalendarWindows("week", n, startDayOfWeek = d)
    *    (reference :56: DaysWindows(7n) anchored at epoch.withDayOfWeek —
    *    the ISO week of 1970-01-01, i.e. Mon 1969-12-29 .. Sun 1970-01-04)
    *  - months(n).withStartingMonth(y,m).beginningOnDay(d)
    *                                   → CalendarWindows("month", n, dayOfMonth = d,
    *                                       startYear = y, startMonth = m)
    *  - years(n).beginningOnDay(m,d)   → CalendarWindows("year", n, monthOfYear = m,
    *                                       dayOfMonth = d)
    *  - .withTimeZone(tz)              → timeZone = tz (IANA id); boundaries at
    *    LOCAL midnight, so window length varies across DST transitions,
    *    matching the reference's Joda plusDays/plusMonths arithmetic.
    * Anchor default = the reference's DEFAULT_START_DATE (epoch,
    * CalendarWindows.java:38). One DELIBERATE divergence: offsets use
    * floor division, so pre-anchor timestamps land in windows that CONTAIN
    * them; the reference's Java integer division truncates toward zero and
    * assigns pre-anchor elements a window starting after them.
    * `startDayOfWeek` is ISO (1=Monday..7=Sunday); a `dayOfMonth` beyond a
    * month's length clamps to its last day (Joda plusMonths behavior). */
  final case class CalendarWindows(
      unit: String,                // "day" | "week" | "month" | "year"
      n: Int = 1,
      timeZone: String = "UTC",
      startDayOfWeek: Int = 1,
      dayOfMonth: Int = 1,
      monthOfYear: Int = 1,
      startYear: Int = 1970,
      startMonth: Int = 1) extends WindowFn {
    require(Set("day", "week", "month", "year")(unit), s"calendar unit: $unit")
    require(n >= 1, s"calendar window span must be >= 1, got $n")
    require(startDayOfWeek >= 1 && startDayOfWeek <= 7, "startDayOfWeek is ISO 1..7")
    require(dayOfMonth >= 1 && dayOfMonth <= 31, "dayOfMonth 1..31")
    require(monthOfYear >= 1 && monthOfYear <= 12, "monthOfYear 1..12")
    /** Default single-unit UTC shape — expressible as a plain date_trunc. */
    def isDefault: Boolean = this == CalendarWindows(unit)
    // reference-shaped fluent modifiers (CalendarWindows.java:79,:192,:186,:34)
    def withTimeZone(tz: String): CalendarWindows = copy(timeZone = tz)
    def beginningOnDay(d: Int): CalendarWindows = copy(dayOfMonth = d)
    def beginningOnDay(m: Int, d: Int): CalendarWindows =
      copy(monthOfYear = m, dayOfMonth = d)
    def withStartingMonth(y: Int, m: Int): CalendarWindows =
      copy(startYear = y, startMonth = m)
  }

  /** Reference-shaped constructors (CalendarWindows.java:46/:56/:67/:83). */
  object CalendarWindows {
    def days(n: Int): CalendarWindows = CalendarWindows("day", n)
    def weeks(n: Int, startDayOfWeek: Int): CalendarWindows =
      CalendarWindows("week", n, startDayOfWeek = startDayOfWeek)
    def months(n: Int): CalendarWindows = CalendarWindows("month", n)
    def years(n: Int): CalendarWindows = CalendarWindows("year", n)
  }

  /** Accumulation + lateness config (reference: WindowingStrategy.java:59-65;
    * defaults :100-106). Trigger semantics map to streaming output modes —
    * see graft.streaming. */
  final case class WindowingStrategy(
      fn: WindowFn = GlobalWindows,
      allowedLateness: String = "0 seconds",
      accumulating: Boolean = false)

  /** The grouping expression(s) for a WindowFn over an event-time column.
    * For Sessions the expression is only valid inside groupBy (Spark
    * restriction on session_window). */
  def windowExpr(fn: WindowFn, ts: Column): Option[Column] = fn match {
    case GlobalWindows              => None
    case FixedWindows(size, off)    => Some(window(ts, size, size, off))
    case SlidingWindows(size, per)  => Some(window(ts, size, per))
    case Sessions(gap)              => Some(session_window(ts, gap))
    case cw: CalendarWindows if cw.isDefault =>
      // Variable-length calendar windows can't be expressed by window();
      // for the default single-unit UTC shape, date_trunc gives the window
      // start (the canonical Beam window id, reference:
      // CalendarWindows.DaysWindows:96 aligns to local day) and end =
      // start + 1 unit, so the column shape is the same struct<start,end>
      // that window()/session_window() emit and TimestampCombiners
      // .endOfWindow composes with any WindowFn. date_trunc aligns to the
      // SESSION zone's midnight, so the same UTC guard as the general
      // calendarWindowExpr path applies here — without it a non-UTC
      // session silently shifts every default day/week/month/year window.
      requireUtcActiveSession("default calendar windows (date_trunc)")
      val start = date_trunc(cw.unit, ts)
      val end = start + expr(s"INTERVAL 1 ${cw.unit.toUpperCase}")
      Some(struct(start.as("start"), end.as("end")))
    case cw: CalendarWindows => Some(calendarWindowExpr(cw, ts))
  }

  /** General calendar-window assignment as pure built-in Column arithmetic
    * (whole-stage-codegen'd — no UDF): local calendar fields via
    * from_utc_timestamp (requires session time zone UTC — [[aggregate]]
    * enforces it), window boundary dates via floor-division offsets from
    * the anchor (exact for pre-anchor elements too), and local-midnight →
    * instant via 7-arg make_timestamp with an explicit zone, which is
    * DST-correct: a day window containing a spring-forward transition is
    * 23 wall-clock hours, matching the reference's Joda arithmetic.
    * Boundaries are re-derived from the ANCHOR for every window (a true
    * grid): with a clamping dayOfMonth (e.g. 31 in February) the windows
    * stay contiguous, where the reference's `begin.plusMonths(n)` end
    * computation (CalendarWindows.java:236) leaves a gap after a clamped
    * begin — a deliberate divergence in favor of total coverage. */
  /** Shared UTC guard for every calendar-window entry point: no active
    * session at Column-construction time is itself an error (skipping the
    * check would let a later non-UTC execution double-shift silently);
    * the zone check is SEMANTIC (GraftSession.isUtcZone — "Etc/UTC" and
    * friends pass) so the default and general paths agree. */
  private def requireUtcActiveSession(what: String): Unit = {
    val session = org.apache.spark.sql.SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException(
        "calendar windows need an active SparkSession at expression-" +
          "construction time to verify spark.sql.session.timeZone=UTC"))
    GraftSession.requireUtc(session, what)
  }

  private[graft] def calendarWindowExpr(cw: CalendarWindows, ts: Column): Column = {
    // local calendar fields are derived via from_utc_timestamp, which only
    // reads local wall time when field extraction runs in UTC. Guarded HERE
    // (not in aggregate()) so every entry point — batch aggregate, the
    // streaming windowedAggregate path, direct expression use — fail-louds
    // instead of silently double-shifting in a non-UTC session.
    requireUtcActiveSession("calendar windows")
    val local = to_date(from_utc_timestamp(ts, cw.timeZone))
    def midnight(d: Column): Column = call_function("make_timestamp",
      year(d), month(d), dayofmonth(d), lit(0), lit(0), lit(0), lit(cw.timeZone))
    // LocalDate(y, m, d) with d clamped to the month's length
    def clampedDay(y: Column, m: Column, d: Int): Column = {
      val first = make_date(y.cast("int"), m.cast("int"), lit(1))
      date_add(first, least(lit(d), dayofmonth(last_day(first))) - 1)
    }
    val (startD, endD): (Column, Column) = cw.unit match {
      case "day" | "week" =>
        val (anchor, span) =
          if (cw.unit == "day") (java.time.LocalDate.of(1970, 1, 1), cw.n)
          else (java.time.LocalDate.of(1969, 12, 29).plusDays(cw.startDayOfWeek - 1L), 7 * cw.n)
        val anchorD = to_date(lit(anchor.toString))
        val diff = datediff(local, anchorD)
        val off = diff - pmod(diff, lit(span))
        val s = date_add(anchorD, off)
        (s, date_add(s, span))
      case "month" =>
        // whole months elapsed since the anchor, counting a month as
        // complete once the (clamp-aware) dayOfMonth is reached — Joda
        // monthsBetween(Jan 31, Feb 28) == 1 because plusMonths clamps
        val anchorLinear = cw.startYear * 12 + (cw.startMonth - 1)
        val effDay = least(lit(cw.dayOfMonth), dayofmonth(last_day(local)))
        val whole = (year(local) * 12 + month(local) - 1 - anchorLinear) -
          when(dayofmonth(local) < effDay, 1).otherwise(0)
        val sLinear = lit(anchorLinear) + whole - pmod(whole, lit(cw.n))
        def gridMonth(lin: Column): Column = clampedDay(
          call_function("div", lin - pmod(lin, lit(12)), lit(12)),
          pmod(lin, lit(12)) + 1, cw.dayOfMonth)
        (gridMonth(sLinear), gridMonth(sLinear + cw.n))
      case "year" =>
        val effDay = least(lit(cw.dayOfMonth),
          dayofmonth(last_day(make_date(year(local), lit(cw.monthOfYear), lit(1)))))
        val before = (month(local) < cw.monthOfYear) ||
          (month(local) === cw.monthOfYear && dayofmonth(local) < effDay)
        val whole = year(local) - cw.startYear - when(before, 1).otherwise(0)
        val sy = lit(cw.startYear) + whole - pmod(whole, lit(cw.n))
        (clampedDay(sy, lit(cw.monthOfYear), cw.dayOfMonth),
          clampedDay(sy + cw.n, lit(cw.monthOfYear), cw.dayOfMonth))
    }
    struct(midnight(startD).as("start"), midnight(endD).as("end"))
  }

  /** JVM-side mirror of [[calendarWindowExpr]] (java.time, same
    * floor/clamp/grid semantics) — the streaming pane processor assigns
    * windows element-wise and needs boundary math off the Column path;
    * WindowsSpec cross-checks the two implementations over a timestamp
    * sweep spanning DST transitions. */
  def calendarWindowStartMs(cw: CalendarWindows, epochMs: Long): Long = {
    val zone = java.time.ZoneId.of(cw.timeZone)
    val ld = java.time.Instant.ofEpochMilli(epochMs).atZone(zone).toLocalDate
    calendarStartDate(cw, ld).atStartOfDay(zone).toInstant.toEpochMilli
  }

  /** End of the window starting at `startMs`: the next grid boundary. */
  def calendarWindowEndMs(cw: CalendarWindows, startMs: Long): Long = {
    val zone = java.time.ZoneId.of(cw.timeZone)
    val sd = java.time.Instant.ofEpochMilli(startMs).atZone(zone).toLocalDate
    val ed = cw.unit match {
      case "day"  => sd.plusDays(cw.n.toLong)
      case "week" => sd.plusDays(7L * cw.n)
      case "month" =>
        val lin = sd.getYear * 12 + (sd.getMonthValue - 1) + cw.n
        clampedDate(Math.floorDiv(lin, 12), Math.floorMod(lin, 12) + 1, cw.dayOfMonth)
      case "year" => clampedDate(sd.getYear + cw.n, cw.monthOfYear, cw.dayOfMonth)
    }
    ed.atStartOfDay(zone).toInstant.toEpochMilli
  }

  private def clampedDate(y: Int, m: Int, d: Int): java.time.LocalDate = {
    val first = java.time.LocalDate.of(y, m, 1)
    first.plusDays(math.min(d, first.lengthOfMonth) - 1L)
  }

  private[graft] def calendarStartDate(cw: CalendarWindows,
                                       ld: java.time.LocalDate): java.time.LocalDate =
    cw.unit match {
      case "day" | "week" =>
        val (anchor, span) =
          if (cw.unit == "day") (java.time.LocalDate.of(1970, 1, 1), cw.n)
          else (java.time.LocalDate.of(1969, 12, 29).plusDays(cw.startDayOfWeek - 1L), 7 * cw.n)
        val diff = java.time.temporal.ChronoUnit.DAYS.between(anchor, ld)
        anchor.plusDays(Math.floorDiv(diff, span.toLong) * span)
      case "month" =>
        val anchorLinear = cw.startYear * 12 + (cw.startMonth - 1)
        val effDay = math.min(cw.dayOfMonth, ld.lengthOfMonth)
        val whole = ld.getYear * 12 + (ld.getMonthValue - 1) - anchorLinear -
          (if (ld.getDayOfMonth < effDay) 1 else 0)
        val sLinear = anchorLinear + Math.floorDiv(whole, cw.n) * cw.n
        clampedDate(Math.floorDiv(sLinear, 12), Math.floorMod(sLinear, 12) + 1, cw.dayOfMonth)
      case "year" =>
        val effDay = math.min(cw.dayOfMonth,
          java.time.LocalDate.of(ld.getYear, cw.monthOfYear, 1).lengthOfMonth)
        val before = ld.getMonthValue < cw.monthOfYear ||
          (ld.getMonthValue == cw.monthOfYear && ld.getDayOfMonth < effDay)
        val whole = ld.getYear - cw.startYear - (if (before) 1 else 0)
        clampedDate(cw.startYear + Math.floorDiv(whole, cw.n) * cw.n,
          cw.monthOfYear, cw.dayOfMonth)
    }

  /** Windowed aggregation: groupBy(window?, keys).agg(...). */
  def aggregate(df: DataFrame, strategy: WindowingStrategy, ts: Column,
                keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val groupCols = windowExpr(strategy.fn, ts).map(_.as("window")).toSeq ++ keys
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Every epoch-aligned sliding-window start whose `[start, start + size)`
    * window contains the whole closed interval `[lo, hi]` — the windows that
    * would see BOTH of two events (same grid as `window(ts, size, period)`
    * with no startTime offset). Lets a per-pair computation run ONCE per key
    * and be attributed to its ≤ size/period covering windows afterwards,
    * instead of replicating every element through the sliding fan-out first
    * (q_traffic_routes' consecutive-reading walk). Pure codegen'd integer
    * floor-division bins over unix_micros — the same exact-`div` idiom as
    * the range join's binOf, never double `/` — so callers can `explode` the
    * result with no UDF. An interval longer than `size`, or one straddling
    * the grid so no aligned window covers it, yields an empty array (never
    * a sequence() error): smallest candidate = first grid start AFTER
    * hi - size, largest = last grid start at-or-before lo. */
  def slidingWindowStartsCovering(lo: Column, hi: Column,
                                  size: String, period: String): Column = {
    val sizeUs = fixedIntervalMicros(size, "size")
    val periodUs = fixedIntervalMicros(period, "period")
    require(periodUs > 0 && sizeUs >= periodUs,
      s"need size >= period > 0, got size=$size period=$period")
    def floorDiv(x: Column, w: Long): Column =
      call_function("div", x - pmod(x, lit(w)), lit(w))
    // GraftSession.epochMicros, not bare unix_micros: callers may hand in
    // columns read straight from parquet, where a no-timezone timestamp[us]
    // arrives as TIMESTAMP_NTZ and unix_micros throws at analysis time.
    val blo = floorDiv(GraftSession.epochMicros(hi) - lit(sizeUs), periodUs) + lit(1L)
    val bhi = floorDiv(GraftSession.epochMicros(lo), periodUs)
    when(blo <= bhi,
        transform(sequence(blo, bhi), b => timestamp_micros(b * lit(periodUs))))
      .otherwise(array().cast("array<timestamp>"))
  }

  /** Interval string → exact microseconds, for grid arithmetic that needs a
    * FIXED step: month-bearing intervals have no constant length and are
    * rejected (days are Spark's fixed 24 h, as in window() itself). Parsed
    * by Spark's own literal parser, which yields an ANSI DayTimeInterval for
    * time units and a CalendarInterval for mixed forms. */
  private def fixedIntervalMicros(s: String, what: String): Long =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(s"INTERVAL $s") match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
          _: org.apache.spark.sql.types.DayTimeIntervalType) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(
          iv: org.apache.spark.unsafe.types.CalendarInterval, _) =>
        require(iv.months == 0,
          s"$what must be a fixed duration (no month units), got '$s'")
        iv.days * 86400000000L + iv.microseconds
      case other => throw new IllegalArgumentException(
        s"$what is not a fixed-duration interval: '$s' ($other)")
    }

  /** TimestampCombiner (reference: windowing/TimestampCombiner.java; default
    * END_OF_WINDOW per WindowingStrategy.java:103): the output timestamp of
    * an aggregated pane. */
  object TimestampCombiners {
    def endOfWindow: Column = col("window.end")
    def earliest(ts: Column): Column = min(ts)
    def latest(ts: Column): Column = max(ts)
  }

  /** Time-series resampling with forward fill: per key, a dense grid of
    * `stepSeconds` slots spanning that key's own [min, max] observations,
    * each slot carrying the LAST observation at-or-before it (leading
    * slots before the first observation stay NULL, `filled` marks
    * carried-forward values). The classic gap-fill/upsample pass an
    * irregular event stream needs before any fixed-step model.
    *
    * Shape: slot assignment is row-local; per-(key, slot) last-observation
    * is one aggregate with a DETERMINISTIC tiebreak (`order` columns —
    * pass a unique id); the grid explodes from a per-key (lo, hi) span
    * pair; the fill is a keyed `last(ignoreNulls)` window — parallel
    * across keys, counter-only state. `maxSlotsPerKey` fail-louds (at
    * EXECUTION time, inside the plan) on a span/step combination that
    * would explode the grid — the knob 100 TB callers must size. */
  def resampleFill(df: DataFrame, key: Column, ts: Column, value: Column,
                   stepSeconds: Long, order: Seq[Column] = Nil,
                   maxSlotsPerKey: Long = 100000L): DataFrame = {
    require(stepSeconds > 0, s"resampleFill needs stepSeconds > 0, got $stepSeconds")
    val step = stepSeconds * 1000000L
    val slotted = df.select(key.as("key"),
      floor(GraftSession.epochMicros(ts) / step).cast("long").as("slot"),
      struct((ts +: order): _*).as("__ord"), value.as("__v"))
    val obs = slotted.groupBy(col("key"), col("slot"))
      .agg(max_by(col("__v"), col("__ord")).as("__v"))
    val spans = slotted.groupBy(col("key"))
      .agg(min(col("slot")).as("__lo"), max(col("slot")).as("__hi"))
    val grid = spans.select(col("key"),
      explode(sequence(col("__lo"),
        when(col("__hi") - col("__lo") < maxSlotsPerKey, col("__hi"))
          .otherwise(raise_error(concat(lit("resampleFill: key "), col("key"),
            lit(s" spans more than $maxSlotsPerKey slots at step ${stepSeconds}s" +
              " — raise stepSeconds or maxSlotsPerKey")))))).as("slot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("slot"))
    grid.join(obs, Seq("key", "slot"), "left")
      .withColumn("value", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("key"), timestamp_micros(col("slot") * step).as("slot_ts"),
        col("value"), (col("__v").isNull && col("value").isNotNull).as("filled"))
  }

  /** Exponentially weighted moving average per key:
    * z_i = α·v_i + (1−α)·z_{i−1} (z_0 = v_0) over the key's observations
    * in (ts, order) total order — the smoothing pass fixed windows can't
    * express (every past observation contributes, geometrically decayed).
    * The recurrence is inherently sequential per key, so it runs through
    * `flatMapSortedGroups`: Spark sorts each key's rows WITHIN the
    * shuffle (no per-group materialization — the iterator streams off the
    * sorter, state is one double), keys proceed in parallel.
    *
    * `order` is a LONG tiebreak column (unique id). Returns
    * (key, ord_ts, ord, value, ewma). At 100 TB: one keyed shuffle +
    * sort — the same cost as any per-key ordered pass; a single giant key
    * serializes only its own iterator (spill-backed), never the stage. */
  def ewma(df: DataFrame, key: Column, ts: Column, order: Column,
           value: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ewma needs alpha in (0, 1], got $alpha")
    // the primitive-tuple encoder path casts key/order to long — the
    // shared fail-loud guard (Guards.requireIntegralId)
    Guards.requireIntegralId(df, key, "ewma key")
    Guards.requireIntegralId(df, order, "ewma order")
    val s = df.sparkSession
    import s.implicits._
    df.select(key.cast("long").as("k"),
        GraftSession.epochMicros(ts).as("t"),
        order.cast("long").as("o"), value.cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("t"), col("o")) { (k, it) =>
        var z = Double.NaN
        var first = true
        it.map { case (_, t, o, v) =>
          z = if (first) { first = false; v } else alpha * v + (1 - alpha) * z
          (k, t, o, v, z)
        }
      }
      .toDF("key", "ord_ts", "ord", "value", "ewma")
      .withColumn("ord_ts", timestamp_micros(col("ord_ts")))
  }

  /** Rolling z-score anomaly signal: per key, each observation scored
    * against the trailing `window` observations' mean/stddev (ROWS frame
    * including the current row — the streaming-friendly definition with
    * no lookahead), NULL until `minObs` observations accumulate (a z
    * against 2 points is noise) or when the frame is constant (stddev 0).
    * One keyed window pass over a total order — parallel across keys,
    * frame-bounded state.
    *
    * The rolled-up signal a quality pipeline thresholds for spike/outage
    * detection; emit the score, let the caller pick the cut (|z| > 3 is
    * the convention). */
  def rollingZScore(df: DataFrame, key: Column, order: Seq[Column],
                    value: Column, window: Int, minObs: Int = 5): DataFrame = {
    require(window >= 2, s"rollingZScore needs window >= 2, got $window")
    require(minObs >= 2 && minObs <= window,
      s"minObs must be in [2, window], got $minObs")
    require(order.nonEmpty, "rollingZScore needs ordering columns (total order)")
    require(!df.columns.contains("z"),
      "rollingZScore: input already has a column named 'z'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order: _*)
      .rowsBetween(-(window - 1), 0)
    val m = avg(value).over(w)
    val sd = stddev_samp(value).over(w)
    val n = count(value).over(w)
    // + 0.0 canonicalizes IEEE negative zero (value == trailing mean rounds
    // to -0.0): equal under float compare but not under cross-engine hash
    // canonicalization, so the output would not be representation-stable
    df.withColumn("z",
      when(n >= minObs && sd > 0, round((value - m) / sd, 4) + lit(0.0)))
  }

  /** Per-ROW session assignment — the analytic sibling of Sessions
    * windows (which only exist at aggregation time): every row gains a
    * 0-based `session_idx` within its key, where a new session starts
    * whenever the gap since the key's previous event exceeds
    * `gapSeconds`. The classic lag-gap-flag + running-sum formulation:
    * two window passes over the SAME (key × time) ordering — one
    * shuffle, parallel across keys, per-group state is a single counter
    * (WindowExec streams frames, nothing materializes per group).
    *
    * `order` must totally order rows within a key (pass a unique
    * tiebreak column after the timestamp) or session boundaries on
    * equal timestamps are partition-dependent. 100 TB: the shuffle is
    * by key — the same partitioning any per-user analysis needs; skewed
    * single users are bounded by the counter-only window state. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
                 order: Seq[Column] = Nil): DataFrame = {
    require(gapSeconds > 0, s"sessionize needs gapSeconds > 0, got $gapSeconds")
    require(!df.columns.contains("session_idx"),
      "sessionize: input already has a column named 'session_idx'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy((ts +: order): _*)
    val prev = lag(ts, 1).over(w)
    val newSession = when(prev.isNull ||
      GraftSession.epochMicros(ts) - GraftSession.epochMicros(prev) >
        lit(gapSeconds * 1000000L), 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)) - 1L)
  }
}
