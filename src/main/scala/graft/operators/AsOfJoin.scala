package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: match each left row to the most recent right row with
  * `rightTime <= leftTime` within the same key — an operator Spark's
  * built-in joins lack.
  *
  * Implementation is the scalable union+window pattern, NOT a range
  * cross-product: tag both inputs, union, one shuffle on the key, sort
  * within partitions by (time, side), and carry the latest right payload
  * forward with `last(..., ignoreNulls)`. Cost is one shuffle + one
  * sort over |L|+|R| rows regardless of temporal density — a
  * non-equi range join here would be O(|L|·|R|) within each key and
  * die at 100 TB; this stays linear and AQE-skew-splittable.
  */
object AsOfJoin {

  /** Generic as-of join. `left`/`right` must have disjoint column names
    * apart from `keys`. Right-side non-key columns come back null when
    * no right row precedes the left row (left-outer as-of semantics).
    *
    * `rightTieBreak` names right-payload columns that break ties among
    * right rows sharing the same (key, time): the row GREATEST on the
    * tie-break wins (it sorts last in the ascending carry-forward
    * window, so `last(...)` picks it). Without it, which same-timestamp
    * right row is carried would depend on partition-internal sort order
    * — nondeterministic across runs. Callers with a unique (key, time)
    * on the right may leave it empty. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val rightTypes = payload.map(c => c -> right.schema(c).dataType).toMap
    val leftTypes = leftOnly.map(c => c -> left.schema(c).dataType).toMap

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftOnly.map(col) ++
        payload.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftOnly.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        payload.map(col): _*)

    // left rows carry null tie-break cols; they order among themselves
    // arbitrarily, which is harmless — only right rows feed `last`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: rightTieBreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.map(c => F.last(col(c), ignoreNulls = true).over(w).as(c))

    taggedLeft.unionByName(taggedRight)
      .select(keys.map(col) ++ leftOnly.map(col) ++ carried :+ col("_side"): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** The verifiable instance: each purchase event matched to the user's
    * most recent prior (or same-instant) click; ties on click_ts go to
    * the greatest click_id, mirrored exactly in the oracle SQL. */
  def purchaseToLastClick(t: Tables): DataFrame = {
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    asofJoin(purchases, clicks, Seq("user_id"), "p_ts", "click_ts",
        rightTieBreak = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("purchase_value"),
        col("click_id"), col("click_ts"))
      .orderBy(col("purchase_id"))
  }
}
