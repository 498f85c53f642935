package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Interval (range-predicate) join, bucketed so it scales.
  *
  * The naive plan for `L join R on key AND r.ts BETWEEN l.ts-w AND l.ts`
  * is an equi-join on key followed by a per-key cross product — O(|L_k|×
  * |R_k|) per key, which explodes on hot keys at 100 TB. Instead each
  * probe row is expanded to the (constant, small) set of fixed-width
  * time buckets its window overlaps, the build side is keyed by its own
  * bucket, and the join becomes a pure equi-join on (key, bucket) whose
  * per-bucket fan-out is bounded by the window/bucket ratio — the
  * standard bucketed interval-join used by time-series engines. AQE can
  * still split skewed (key, bucket) pairs because the physical plan is a
  * plain shuffle join.
  *
  * Mirrors the reference's temporal pairing of observation timestamps
  * (crowdsorsa-etl-2023.R:55-61 parses begin/end timestamps per event);
  * the as-of join (AsOfJoin.scala) picks the single latest match,
  * this operator keeps ALL matches inside the window.
  */
object RangeJoin {

  private val P = DecimalType(9, 2)
  /** Bucket width == window width (1 h): every window overlaps ≤2 buckets. */
  private val BucketUs = 3600L * 1000000L

  /** For each purchase, aggregate the clicks of the same user in the
    * preceding hour (exclusive-open lower bound, closed upper bound):
    * n_clicks + exact-decimal click-value sum. Purchases with no click
    * in range are kept with zeros (left-outer semantics, done as an
    * inner bucket join + aggregate + right join back so the bucket
    * explode never produces unmatched-row duplicates). */
  def clicksBeforePurchase(t: Tables): DataFrame = clicksBefore(t.events)

  /** Same contract over any frame with (event_id, user_id, event_type,
    * ts, value) — the unit-testable kernel. */
  def clicksBefore(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("value"),
        (unix_micros(col("ts")) / BucketUs).cast("long").as("bucket"))
    // each 1h-window overlaps exactly the purchase's bucket and the one before
    val probes = p.withColumn("bucket",
        explode(array((unix_micros(col("p_ts")) / BucketUs).cast("long") - 1,
          (unix_micros(col("p_ts")) / BucketUs).cast("long"))))
    val matched = probes.join(c, Seq("user_id", "bucket"))
      .filter(col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast(P)).cast(DoubleType).as("click_value"))
    p.select(col("purchase_id"))
      .join(matched, Seq("purchase_id"), "left")
      .select(col("purchase_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("purchase_id"))
  }

  /** SPAN-CLASSED interval×interval overlap pairs (r17) — the total
    * form of the bucketed join, valid for ANY span distribution where
    * [[intervalJoin]]'s single-grid plan assumes bounded spans (an
    * unbounded interval would explode its bucket fan-out). Intervals
    * split by span at `threshold`:
    *
    *   - SHORT × SHORT: the bucketed equi-join (grid width =
    *     threshold ⇒ every short interval covers ≤ 2 cells), pairs
    *     counted once in the cell their overlap starts — never
    *     all-pairs, AQE splits residual skew;
    *   - pairs involving a LONG interval: the long tail is SMALL by
    *     construction in heavy-tailed data (the distribution this
    *     exists for), so it BROADCASTS: long × short is one broadcast
    *     hash join on the key with the overlap as residual, long ×
    *     long an id-ordered self-pairing of the broadcast set. The
    *     three families are class-disjoint, so no pair is produced
    *     twice and no DISTINCT is ever needed.
    *
    * Input: (pk, id, s, r) with s ≤ r, id unique. Output: one (pk, od)
    * row per overlapping unordered pair (od = overlap days). The
    * broadcast premise is GUARDED: if the long tail exceeds
    * `maxLongRows` the join aborts with guidance (raise the threshold
    * — a coarser grid — instead of silently building a giant
    * broadcast), so the operator never degrades into an implicit
    * cross product at scale. */
  def spanClassedPairs(iv: DataFrame, threshold: Long,
                       maxLongRows: Long = 2000000L): DataFrame = {
    val span = col("r") - col("s")
    // r18: the input feeds the short grid (self-joined), the long-tail
    // count guard and three join families — materialize it once
    val ivP = iv.persistTracked()
    val short = ivP.filter(span <= threshold)
    val longTail = ivP.filter(span > threshold)
    val nLong = longTail.count()
    require(nLong <= maxLongRows,
      s"spanClassedPairs: $nLong intervals exceed span $threshold - too " +
        "many to broadcast; raise the threshold (coarser grid) or " +
        "maxLongRows")
    val overlapDays =
      (least(col("r_a"), col("r_b")) - greatest(col("s_a"), col("s_b")) + 1)
        .as("od")
    def sided(df: DataFrame, tag: String, extra: Seq[String] = Nil) =
      df.select((Seq(col("pk")) ++ extra.map(col) ++ Seq(
        col("id").as(s"id_$tag"), col("s").as(s"s_$tag"),
        col("r").as(s"r_$tag"))): _*)
    // short × short: the bounded grid
    val sw = short.withColumn("w",
      explode(sequence(expr(s"s DIV $threshold"), expr(s"r DIV $threshold"))))
    val ss = sided(sw, "a", Seq("w")).join(sided(sw, "b", Seq("w")),
        Seq("pk", "w"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("r_b") && col("s_b") <= col("r_a") &&
        expr(s"GREATEST(s_a, s_b) DIV $threshold") === col("w"))
      .select(col("pk"), overlapDays)
    // long × short: broadcast hash join on pk, overlap residual
    val ls = sided(short, "a").join(
        broadcast(sided(longTail, "b")), Seq("pk"))
      .filter(col("s_a") <= col("r_b") && col("s_b") <= col("r_a"))
      .select(col("pk"), overlapDays)
    // long × long: id-ordered self-pairing inside the small set
    val ll = sided(longTail, "a").join(
        broadcast(sided(longTail, "b")), Seq("pk"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("r_b") && col("s_b") <= col("r_a"))
      .select(col("pk"), overlapDays)
    ss.unionByName(ls).unionByName(ll)
  }

  /** [[spanClassedPairs]] on a HEAVY-TAILED transit distribution (r17,
    * oracled): ~1% of shipments get a 180–379-day in-transit interval
    * (the single-grid plan would explode those to ~50 buckets each),
    * the rest ≤ 14 days. Same aggregate contract as [[intervalJoin]];
    * the oracle replays the all-pairs DEFINITION, so the gate proves
    * the three class-disjoint join families partition the pair space
    * exactly. */
  def intervalJoinSkew(t: Tables): DataFrame = {
    val id = (col("l_orderkey") * 8 + col("l_linenumber")).cast("long")
    val base = t.lineitem.select(
        col("l_partkey").cast("long").as("pk"),
        id.as("id"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("s"),
        when(id % 97 === 0, lit(180L) + id % 200)
          .otherwise(id % 14 + 1).as("tr"))
      .withColumn("r", col("s") + col("tr"))
    spanClassedPairs(base.select("pk", "id", "s", "r"), threshold = 14L)
      .groupBy(col("pk"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("od")).cast("long").as("overlap_days"),
        max(col("od")).cast("long").as("max_overlap"))
      .select(col("pk").as("p_partkey"), col("n_pairs"),
        col("overlap_days"), col("max_overlap"))
      .orderBy(col("p_partkey"))
  }

  /** INTERVAL × INTERVAL overlap join (the temporal-join shape
    * [[clicksBefore]] doesn't cover — both sides are ranges, not a
    * point probing a window): per part, all pairs of shipments whose
    * in-transit intervals [ship, ship+transit] overlapped, aggregated
    * to (pairs, total/max overlap days). Transit is an id-derived
    * deterministic integer, so the whole join is exact epoch-day
    * arithmetic both engines replay.
    *
    * Plan: intervals explode to their covered WEEK buckets (span ≤ 28
    * days ⇒ ≤ 5 buckets — the bounded-span premise every single-grid
    * bucketed interval join needs; [[spanClassedPairs]] is the TOTAL
    * form for unbounded/heavy-tailed spans) and candidates come from the (part, week)
    * equi-join; a pair sharing several weeks is COUNTED ONCE, in the
    * week its overlap STARTS (max(s_a, s_b) lies in both intervals,
    * so both sides are guaranteed present in that bucket — the
    * standard dedupe that avoids a DISTINCT over the candidate set).
    * Never all-pairs: a hot part is still bounded per (part, week)
    * cell, and AQE splits residual skew. The oracle replays the
    * DEFINITION (all same-part pairs + overlap predicate) rather than
    * the bucketing, so the gate proves the bucketed plan equals the
    * semantic spec. */
  def intervalJoin(t: Tables): DataFrame = {
    val base = t.lineitem.select(
        col("l_partkey").cast("long").as("pk"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("id"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("s"),
        ((col("l_orderkey") + col("l_linenumber")) % 21 + 7).cast("long").as("tr"))
      .withColumn("r", col("s") + col("tr"))
    val weeks = base.withColumn("w",
      explode(sequence(expr("s DIV 7"), expr("r DIV 7"))))
      .persistTracked() // self-joined: scan + week fan-out once, not twice
    val lhs = weeks.select(col("pk"), col("w"), col("id").as("id_a"),
      col("s").as("s_a"), col("r").as("r_a"))
    val rhs = weeks.select(col("pk"), col("w"), col("id").as("id_b"),
      col("s").as("s_b"), col("r").as("r_b"))
    lhs.join(rhs, Seq("pk", "w"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("r_b") && col("s_b") <= col("r_a") &&
        expr("GREATEST(s_a, s_b) DIV 7") === col("w"))
      .select(col("pk"),
        (least(col("r_a"), col("r_b")) -
          greatest(col("s_a"), col("s_b")) + 1).as("od"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("od")).cast("long").as("overlap_days"),
        max(col("od")).cast("long").as("max_overlap"))
      .select(col("pk").as("p_partkey"), col("n_pairs"),
        col("overlap_days"), col("max_overlap"))
      .orderBy(col("p_partkey"))
  }
}
