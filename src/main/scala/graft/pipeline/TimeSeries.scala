package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference cannot express (its engine has no window
  * machinery beyond plain SQL windows; see SURVEY.md §2.6) but that every
  * event-log / feature-engineering pipeline needs: as-of joins and
  * point-in-interval range joins.
  *
  * Both are built to AVOID the naive plans Spark would otherwise pick:
  *
  *  - an as-of join written as `probe JOIN ref ON key AND ref.ts <= probe.ts`
  *    + a max-window is a skew-prone O(probe × ref-per-key) expansion;
  *  - a range join written as `ON key AND ts BETWEEN lo AND hi` leaves the
  *    range predicate as a post-join filter over the same expansion, and
  *    with no equi-key at all degenerates to BroadcastNestedLoopJoin.
  *
  * Instead `asofJoin` is a union + ONE window (single hash shuffle on the
  * key, no join operator at all) and `rangeJoinBinned` is an equi-join on
  * (key, time-bin) — both shapes scale linearly in input size at any key
  * cardinality above the parallelism.
  */
object TimeSeries {

  /** As-of join: for every probe row, attach the payload of the LATEST ref
    * row with `ref.timeCol <= probe.timeCol` for the same `keys` (at equal
    * timestamps the ref row counts — "at or before"). Probe rows with no
    * prior ref row (or none within `tolerance`, when given) keep null
    * payloads — left-join semantics.
    *
    * Plan shape: ref and probe are unioned with a side tag, then one window
    * `partitionBy(keys).orderBy(timeCol, side)` carries the last ref
    * (timestamp, payload) struct forward with ignoreNulls. Cost = one
    * shuffle of |probe| + |ref| rows on `keys` + a per-key sort — the same
    * work a sort-merge join would do for the shuffle alone, with no join
    * expansion. The carried struct keeps "latest ref row had a null
    * payload" distinct from "no ref row yet".
    *
    * At 100 TB: the only skew risk is a single hot key (one task sorts that
    * key's rows). Keys here are entity ids (user, instrument, device), whose
    * per-key row counts are bounded by real-world activity; for a truly hot
    * key, pre-split by time range and stitch at the boundary.
    *
    * `payload` columns must exist on `ref` and must not collide with probe
    * column names; `matchedTimeCol` (the ref timestamp that matched) is
    * appended when `withMatchedTime` is set.
    *
    * When two REF rows share a (key, timestamp), which one "wins" is
    * undefined by ordering alone; pass `tieBreak` (payload column names,
    * highest-precedence first) to pin the winner deterministically — the
    * LAST row under that ordering carries.
    */
  def asofJoin(probe: DataFrame, ref: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               tolerance: Option[Column] = None,
               withMatchedTime: Option[String] = None,
               tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val probeCols = probe.columns.toSeq
    val collisions = payload.toSet intersect probeCols.toSet
    require(collisions.isEmpty, s"payload columns collide with probe columns: $collisions")

    val side = "__asof_side"
    val mStruct = "__asof_match"
    // align both sides on: keys ++ timeCol ++ (probe-only cols) ++ payload ++ side
    val probeOnly = probeCols.filterNot(c => keys.contains(c) || c == timeCol)
    val refAligned = ref.select(
      (keys :+ timeCol).map(col) ++
        probeOnly.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
        payload.map(col) :+ lit(0).as(side): _*)
    val probeAligned = probe.select(
      (keys :+ timeCol).map(col) ++
        probeOnly.map(col) ++
        payload.map(c => lit(null).cast(ref.schema(c).dataType).as(c)) :+ lit(1).as(side): _*)

    // tie-break columns order ASC NULLS FIRST explicitly (engines disagree
    // on default null placement; probe rows are all-null there and sort
    // together regardless, so only ref-vs-ref ties are affected)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc +: col(side).asc +:
        tieBreak.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the whole (ts, payload…) struct of the last REF row: ignoreNulls
    // skips probe rows (struct literal null there) but NOT a ref row whose
    // payload happens to be null — exact as-of semantics
    val refStruct = when(col(side) === 0,
      struct((col(timeCol).as("__ts") +: payload.map(col)): _*))

    val matched = refAligned.unionByName(probeAligned)
      .withColumn(mStruct, last(refStruct, ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    // tolerance compares against (probe time − matched ref time): pass
    // `make_dt_interval(...)` for timestamp columns (their difference is a
    // day-time interval, incl. TIMESTAMP_NTZ) or a plain number for numeric
    // time columns
    val inRange = tolerance match {
      case Some(tol) => col(mStruct).isNotNull &&
        col(timeCol) - col(mStruct).getField("__ts") <= tol
      case None => col(mStruct).isNotNull
    }
    val out = probeCols.map(col) ++
      payload.map(p => when(inRange, col(mStruct).getField(p)).as(p)) ++
      withMatchedTime.map(n => when(inRange, col(mStruct).getField("__ts")).as(n))
    matched.select(out: _*)
  }

  /** Gap-based sessionization: within each `keys` group, rows ordered by
    * (`timeCol`, `tieBreak`…) start a new session whenever the gap from the
    * previous row exceeds `gap` (pass `expr("INTERVAL '30' MINUTE")` for
    * timestamp columns, a plain number for numeric time). Adds a 1-based
    * `session_idx` per key — the classic event-log operator behind session
    * analytics, funnel windows, and per-visit aggregation.
    *
    * Plan shape: ONE shuffle + sort on (`keys`; time, tieBreak) serving two
    * stacked window projections (lag → is-start flag, then a running sum) —
    * Spark plans both over the same sort, so cost equals a single window.
    * Skew follows key activity, same bound as [[asofJoin]].
    */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
                 gap: Column, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    val ord = col(timeCol).asc +: tieBreak.map(c => col(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val prev = lag(col(timeCol), 1).over(w)
    val isStart = when(prev.isNull || (col(timeCol) - prev > gap), 1).otherwise(0)
    df.withColumn("__session_start", isStart)
      .withColumn("session_idx",
        sum(col("__session_start"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("__session_start")
  }

  /** Daily activity series with a trailing `windowDays`-day rolling event
    * sum: (day, n_events, dau, n_<w>d). The rolling frame is a RANGE window
    * over an integer day number, so gap days (no events) still bound the
    * frame correctly — a ROWS frame would silently span across gaps.
    *
    * Plan shape: the heavy lifting is the per-day aggregate (day-keyed
    * shuffle with map-side partials, plus the distinct-entity expansion for
    * dau); the rolling window then runs over ROWS = #days — metadata-scale
    * (a decade is ~3.7k rows), so its single-partition sort is free by
    * construction. */
  def rollingDailyStats(events: DataFrame, timeCol: String, entityCol: String,
                        windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val daily = events
      .groupBy(date_trunc("day", col(timeCol)).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(entityCol)).as("dau"))
    val w = Window.orderBy(col("__dn")).rangeBetween(-(windowDays - 1), 0)
    daily
      .withColumn("__dn", datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
      .withColumn(s"n_${windowDays}d", sum(col("n_events")).over(w).cast("long"))
      .drop("__dn")
  }

  /** Per-entity activity spike detection: flags (entity, day) pairs whose
    * event count exceeds `factor ×` the entity's trailing `trailDays`-day
    * daily AVERAGE — the test is kept in exact integer form
    * (`n × trailDays > factor × trail_sum`), so both engines agree bitwise;
    * no IEEE mean, no stddev. Entities need `minTrailDays` distinct active
    * days of history before a spike can be called (cold starts are not
    * anomalies). The trailing frame EXCLUDES the current day (a spike must
    * not raise its own baseline) and is a RANGE frame over an integer day
    * number, so calendar gap days shrink the baseline window correctly.
    *
    * Plan shape (100 TB): the event log collapses to (entity, day) counts
    * in ONE map-side-combining shuffle; the window then runs over active
    * entity-days — orders of magnitude smaller than the log. One further
    * hash shuffle re-keys those counts by entity alone. Nothing about the
    * raw event stream is sorted or carried past the first aggregate.
    */
  def spikeDays(events: DataFrame, entityCol: String, timeCol: String,
                factor: Int = 3, trailDays: Int = 7,
                minTrailDays: Int = 3): DataFrame = {
    require(factor >= 1 && trailDays >= 1 && minTrailDays >= 1,
      "factor, trailDays and minTrailDays must be positive")
    require(minTrailDays <= trailDays,
      s"minTrailDays ($minTrailDays) cannot exceed trailDays ($trailDays): the " +
        s"$trailDays-day frame can never hold that many history rows, so no day " +
        "could ever be flagged")
    val daily = events
      .groupBy(col(entityCol), date_trunc("day", col(timeCol)).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__dn", datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__dn"))
      .rangeBetween(-trailDays, -1)
    daily
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("trail_days", count(col("n_events")).over(w))
      .filter(col("trail_days") >= minTrailDays &&
        col("n_events") * lit(trailDays.toLong) > lit(factor.toLong) * col("trail_sum"))
      .select(col(entityCol), col("day"), col("n_events"),
        col("trail_sum").cast("long").as("trail_sum"))
  }

  /** Ordered-step conversion funnel: for each `keys` entity, the earliest
    * time of step 1, then the earliest step-2 event AT OR AFTER that (and
    * within `window`, when given), and so on — the standard product-analytics
    * funnel with per-step timeout. Returns one row per entity that reached
    * step 1, with columns `t1..tN` (null from the first step not reached;
    * `stepNames` renames them).
    *
    * Plan shape: N rounds of (type-filtered scan → key-keyed min-aggregate →
    * join with the previous step's table). The step tables are one row per
    * surviving entity — orders of magnitude smaller than the event log — so
    * every join is a key-keyed shuffle (or broadcast, once stats see the
    * shrink) of aggregates, never an event-by-event expansion; the event
    * scan per round carries its `stepCol` filter down to the source.
    */
  def funnel(events: DataFrame, keys: Seq[String], timeCol: String,
             stepCol: String, steps: Seq[String],
             window: Option[Column] = None,
             stepNames: Seq[String] = Nil): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(stepNames.isEmpty || stepNames.size == steps.size,
      "stepNames must match steps")
    val names = if (stepNames.nonEmpty) stepNames
                else steps.indices.map(i => s"t${i + 1}")
    val first = events.filter(col(stepCol) === steps.head)
      .groupBy(keys.map(col): _*).agg(min(col(timeCol)).as(names.head))
    val completed = steps.zip(names).zipWithIndex.drop(1)
      .foldLeft(first) { case (prev, ((step, name), i)) =>
        val prevT = col(names(i - 1))
        val bound = window match {
          case Some(w) => col(timeCol) >= prevT && col(timeCol) <= prevT + w
          case None => col(timeCol) >= prevT
        }
        val next = events.filter(col(stepCol) === step)
          .join(prev.select((keys.map(col) :+ prevT): _*), keys)
          .filter(bound)
          .groupBy(keys.map(col): _*).agg(min(col(timeCol)).as(name))
        prev.join(next, keys, "left")
      }
    completed
  }

  /** Cohort retention: entities are grouped by the period of their first
    * `anchorPred` event (e.g. signup week), and each subsequent period in
    * which they show ANY activity marks them retained. Returns
    * (cohort_period DATE, period_idx, n_active) — the classic retention
    * triangle. `periodDays` must divide the truncation evenly; with `week`
    * truncation both the cohort anchor and activity periods align on Monday
    * boundaries, so the day-difference is an exact multiple of 7.
    *
    * Plan shape: one anchor aggregate (rows = entities), one
    * entity-period distinct over the activity log (map-side partial
    * dedup), a key-keyed join between them, and the final small aggregate.
    */
  def cohortRetention(events: DataFrame, keys: Seq[String], timeCol: String,
                      anchorPred: Column): DataFrame = {
    val cohort = events.filter(anchorPred)
      .groupBy(keys.map(col): _*)
      .agg(date_trunc("week", min(col(timeCol))).cast("date").as("__w0"))
    val act = events
      .join(cohort, keys)
      .filter(col(timeCol) >= col("__w0"))
      .select((keys.map(col) :+ col("__w0") :+
        (datediff(date_trunc("week", col(timeCol)).cast("date"), col("__w0")) / 7)
          .cast("long").as("period_idx")): _*)
      .distinct()
    act.groupBy(col("__w0").as("cohort_week"), col("period_idx"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Point-in-interval range join: every (point, interval) pair with
    * `startCol <= pointTime <= endCol` and equal `keys`, returned as joined
    * rows (all point columns + all interval columns).
    *
    * Plan shape: time is quantized into `binSeconds` buckets; an interval
    * registers under every bin it overlaps (`sequence` + `explode` — for
    * intervals ≤ binSeconds long that is ≤ 2 bins), a point under exactly
    * one. The join is then a pure equi-join on (keys, bin) with the precise
    * range predicate as the residual filter. Because a point lives in ONE
    * bin, each qualifying (point, interval) pair is emitted exactly once —
    * no post-join dedup.
    *
    * Pick `binSeconds` ≈ the typical interval length: expansion factor =
    * avg(interval span / binSeconds) + 1. At 100 TB this stays a shuffled
    * hash join keyed by (entity, coarse time) — time-locality in the data
    * becomes join locality, and there is no nested-loop fallback.
    *
    * Intervals with `end < start` are dropped (Spark's `sequence` would
    * otherwise generate a DESCENDING bin list and silently register the
    * interval under wrong bins).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointTime: String, startCol: String, endCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val bin = "__range_bin"
    // timestamps (incl. TIMESTAMP_NTZ, which cannot cast to double) bin via
    // the epoch-aligned tumbling-window start — timezone-free and identical
    // on both sides; numeric time columns bin by plain floor division
    val isTime = points.schema(pointTime).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => true
      case _: org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def binOf(c: Column): Column =
      if (isTime) window(c, s"$binSeconds seconds").getField("start")
      else floor(c.cast("double") / binSeconds).cast("long")

    val p = points.withColumn(bin, binOf(col(pointTime)))
    // the analyzer allows one time-window expression per projection, so the
    // two interval endpoints bin in SEPARATE stages (rewritten at analysis
    // time — CollapseProject never sees the raw window calls)
    val ivBase = intervals.filter(col(endCol) >= col(startCol))
    val iv =
      if (isTime)
        ivBase.withColumn("__bin_lo", binOf(col(startCol)))
          .withColumn("__bin_hi", binOf(col(endCol)))
          .withColumn(bin, explode(sequence(col("__bin_lo"), col("__bin_hi"),
            expr(s"INTERVAL '$binSeconds' SECOND"))))
          .drop("__bin_lo", "__bin_hi")
      else
        ivBase.withColumn(bin, explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))

    p.join(iv, keys :+ bin)
      .filter(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .drop(bin)
  }
}
