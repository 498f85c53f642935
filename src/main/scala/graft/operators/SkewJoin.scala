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
}
