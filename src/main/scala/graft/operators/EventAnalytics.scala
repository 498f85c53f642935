package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-sequence analytics: funnels, cohort retention, transition
  * matrices, and exact-moment standardization. These are the queries a
  * product/observation warehouse (the reference's FinBIF push target)
  * runs downstream of ingestion — all single-shuffle-per-stage shapes
  * keyed on user_id, so the event table is hashed once per stage and
  * partial aggregation keeps the shuffled rows skinny.
  */
object EventAnalytics {

  /** Ordered conversion funnel view → click → purchase: each stage's
    * first timestamp must strictly follow the previous stage's first
    * occurrence. Staged as chained (filter → join on user → min)
    * aggregates: every intermediate is ONE skinny row per surviving
    * user (never a per-user event array, which a hot user would blow
    * up at 100 TB), and each stage is a single hash shuffle on
    * user_id that AQE can coalesce. */
  def funnel(t: Tables): DataFrame = funnelOf(t.events)

  /** Same contract over any (user_id, event_type, ts) frame. */
  def funnelOf(ev: DataFrame): DataFrame = {
    // v and c each feed the next stage AND a final count; persist the
    // skinny per-user mins so the events scan isn't re-run per use.
    // Deliberately NOT unpersisted here: the result is lazy, so an
    // unpersist before the caller materializes it would re-duplicate
    // the shared subtrees. The caches live until the caller's
    // clearCache()/session end — skinny per-user rows, bounded cost.
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      .persistTracked()
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      .persistTracked()
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** Cohort retention: users grouped by the epoch-week of their first
    * event; for each (cohort, weeks-since) the count of distinct
    * active users. Two skinny aggregates (first-seen per user; active
    * user-weeks) joined on user — the classic retention triangle. */
  def cohortRetention(t: Tables): DataFrame = {
    val weekNum: Column => Column = ts =>
      floor(datediff(ts.cast("date"), lit("1970-01-01").cast("date")) / 7).cast("long")
    val firstSeen = t.events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), weekNum(col("first_ts")).as("cohort_w"))
    val active = t.events
      .select(col("user_id"), weekNum(col("ts")).as("active_w"))
      .distinct()
    firstSeen.join(active, Seq("user_id"))
      .groupBy(col("cohort_w"), (col("active_w") - col("cohort_w")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_w"), col("weeks_since"))
  }

  /** Event-type transition counts (the first-order Markov matrix of
    * user behavior): lag window per user ordered by (ts, event_id),
    * then count by (prev, next) pair. One window shuffle on user_id,
    * one skinny aggregate over 25 pairs. */
  def transitions(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_type").as("next_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Time-series gap fill + forward fill (resample to a daily grid):
    * per-user daily aggregates are left-joined onto each user's full
    * day spine (sequence + explode — the spine is generated
    * distributed, sized by each user's own span, never a global
    * calendar cross-join), then value gaps carry the last observation
    * forward via an IGNORE NULLS running window. Two shuffles: the
    * daily aggregate and the spine join share the user hash; the
    * window reuses it. */
  def gapFill(t: Tables): DataFrame = {
    val d = DecimalType(9, 2)
    val daily = t.events.filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(d)).cast(DoubleType).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Per-group z-scores with EXACT moments: sum and sum-of-squares go
    * through decimal aggregation (associative-exact, so partition
    * order can't perturb them — unlike Welford-style stddev whose
    * merge order varies run to run), then one fixed sequence of
    * correctly-rounded double ops (var = q/n − mean², z = (x−mean)/σ)
    * that every IEEE engine computes bit-identically. */
  def zscore(t: Tables): DataFrame = {
    val d = DecimalType(9, 2)
    val moments = t.events.groupBy(col("event_type")).agg(
      sum(col("value").cast(d)).cast(DoubleType).as("s"),
      sum(col("value").cast(d) * col("value").cast(d)).cast(DoubleType).as("q"),
      count(lit(1)).cast(DoubleType).as("n"))
    val mean = col("s") / col("n")
    val variance = col("q") / col("n") - (col("s") / col("n")) * (col("s") / col("n"))
    t.events
      .join(broadcast(moments), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        ((col("value") - mean) / sqrt(variance)).as("z"))
      .orderBy(col("event_id"))
  }

  /** SCD Type-2 interval build: an append-only change feed becomes the
    * warehouse dimension-history table — each state row valid from its
    * own timestamp until the key's NEXT change (open-ended for the
    * latest). One window shuffle on the key; at any SF the state per
    * key is one sort run, never a collect_list. `is_current` is a
    * BIGINT flag (0/1) for cross-engine type parity. */
  def scd2(t: Tables, maxUser: Long = 100): DataFrame =
    t.events.filter(col("user_id") < maxUser)
      .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        col("event_type").as("state"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))

  /** GAPS-AND-ISLANDS streak detection (the canonical consecutive-runs
    * idiom this surface didn't yet cover — retention/engagement's
    * "longest daily streak"): per user, distinct ACTIVE DAYS collapse
    * into maximal runs of consecutive dates via the row_number
    * difference trick (day − rn is constant exactly within a run — no
    * self-join, no recursive walk), then one aggregate per user:
    * longest streak, number of islands, active days.
    *
    * Scale: one distinct (user, day) aggregate (map-side combined —
    * events collapse to ≤ users×days rows), one per-user window over
    * those SKINNY day rows (never raw events), one final aggregate.
    * Epoch-day integers end to end — exact in both engines. */
  def streaks(t: Tables): DataFrame = {
    val days = t.events
      .select(col("user_id"),
        datediff(col("ts"), lit("1970-01-01")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).cast("long").as("longest_streak"),
        count(lit(1)).cast("long").as("n_islands"),
        sum(col("len")).cast("long").as("active_days"))
      .orderBy(col("user_id"))
  }
}
