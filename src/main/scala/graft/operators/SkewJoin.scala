package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most skew at
  * runtime; salting is the plan-level tool for the pathological case —
  * one key holding a double-digit percentage of a 100 TB fact table,
  * where even a split partition overwhelms its executor. The big side
  * gets a deterministic salt in [0, salts); the small side is exploded
  * `salts`-fold so every (key, salt) bucket still finds its match. Row
  * multiplication is confined to the SMALL side.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    // deterministic spread: hash of the whole big-side row, not rand()
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Oracled instance: events (user 13 is the reference's hot-key
    * override, and synthetic traffic is zipf-ish anyway) salted-joined
    * to the customer dim, aggregated per nation. The salt is plumbing
    * only — the result must equal the plain join, which is exactly
    * what the DuckDB oracle runs. Forces the shuffle path (no
    * broadcast) so the salt actually spreads the hot key's rows. */
  def saltedEnrich(t: graft.sources.Tables): DataFrame = {
    val ev = t.events.select(col("user_id"), col("value"))
    val cust = t.customer.select(col("c_custkey").as("user_id"), col("c_nationkey"))
      .hint("shuffle_hash") // keep the salted shuffle join honest
    SkewJoin.saltedJoin(ev, cust, "user_id", salts = 8)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(9, 2)))
          .cast("double").as("total_value"))
      .orderBy(col("c_nationkey"))
  }
}
