package graft

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: named row/byte
  * accounting metrics that ride INSIDE the job (accumulator-backed,
  * zero extra passes — unlike a `count()` audit, which re-executes the
  * plan). A long-running 100 TB pipeline publishes these per stage to
  * catch row-loss/row-explosion regressions the moment they ship.
  */
object Observability {

  /** Attach standard row accounting to a frame. Returns the observed
    * frame and the handle; `obs.get` blocks until the NEXT action on
    * the frame completes, then yields the metric map. Each Observation
    * instance is single-use (Spark contract) — attach one per stage. */
  def rowAudit(df: DataFrame, name: String,
               extra: Seq[org.apache.spark.sql.Column] = Nil): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, count(lit(1)).as("rows"), extra: _*), obs)
  }
}
