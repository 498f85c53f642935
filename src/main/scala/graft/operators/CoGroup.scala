package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed cogroup: per-key reconciliation of two datasets where the
  * per-key logic is genuinely imperative (cross-referencing both
  * sides' full groups) — the one shape that neither a join nor an
  * aggregate expresses without exploding rows. Both sides hash ONCE on
  * the key (cogroup = two co-partitioned shuffles, same as a join);
  * the closure sees two iterators and emits one audit row per key.
  *
  * Used sparingly by design: anything expressible as join+agg should
  * be (codegen + AQE beat closures) — see the `reconcileSql` twin that
  * the spec compares against.
  */
object CoGroup {

  final case class OrderK(o_custkey: Long, o_totalprice: Double)
  final case class EventK(user_id: Long, value: Double)
  final case class Recon(key: Long, n_orders: Long, n_events: Long,
                         spend: Double, activity: Double, status: String)

  /** Per-user order-vs-event reconciliation with group-level logic:
    * status depends on BOTH groups' presence and relative sizes. */
  def reconcile(t: Tables): Dataset[Recon] = {
    val spark = t.spark
    import spark.implicits._
    val orders = t.orders.select(col("o_custkey"), col("o_totalprice")).as[OrderK]
    val events = t.events.select(col("user_id"), col("value")).as[EventK]
    orders.groupByKey(_.o_custkey)
      .cogroup(events.groupByKey(_.user_id)) { (k, os, es) =>
        var nO = 0L; var spend = 0.0
        os.foreach { o => nO += 1; spend += o.o_totalprice }
        var nE = 0L; var act = 0.0
        es.foreach { e => nE += 1; act += e.value }
        val status =
          if (nO == 0) "events_only"
          else if (nE == 0) "orders_only"
          else if (nE > nO) "engaged"
          else "dormant"
        Iterator.single(Recon(k, nO, nE, spend, act, status))
      }
  }

  /** The declarative twin (full outer join of two pre-aggregates) used
    * as the spec's correctness oracle for the closure version. */
  def reconcileSql(t: Tables): DataFrame = {
    val o = t.orders.groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
    val e = t.events.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("activity"))
    o.join(e, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_orders").isNull, "events_only")
          .when(col("n_events").isNull, "orders_only")
          .when(col("n_events") > col("n_orders"), "engaged")
          .otherwise("dormant").as("status"))
  }
}
