package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The remaining TPC-H query shapes (Q7-Q10, Q13, Q15, Q17-Q19, Q22),
  * adapted to this schema (no partsupp / l_shipmode / l_commitdate /
  * c_phone — stand-ins documented per query). Together with
  * Analytics.q1/q3/q5 and Relational.q4/q6/q12/q14 this covers every
  * relational shape in the TPC-H suite that the schema can express:
  * two-sided OR dim filters, ratio-of-conditional-aggregates, partial
  * anti joins, agg-of-agg distributions, argmax via scalar subquery,
  * correlated per-group thresholds, IN-on-aggregate semi joins,
  * OR-of-ANDs multi-arm predicates, and anti-joined scalar-subquery
  * cohorts.
  *
  * Scale shape notes: dimension sides (nation/supplier/customer/part)
  * broadcast at any SF — the lineitem/orders fact sides never shuffle
  * for enrichment, only for their aggregate or fact-fact join key.
  * Double SUMs go through exact DECIMAL casts (see Analytics scaladoc).
  */
object TpcHShapes {

  private val P = DecimalType(9, 2)
  private val R = DecimalType(4, 2)
  private def d(c: Column): Column = c.cast(P)
  private def discF(c: Column): Column = lit(1).cast(R) - c.cast(R)
  private def vol: Column = d(col("l_extendedprice")) * discF(col("l_discount"))
  private def dsum(c: Column): Column = sum(d(c)).cast(DoubleType)
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Q7 volume shipping: revenue flowing between two nations, by
    * direction and year. Both dims are pre-filtered to the two nations
    * BEFORE their broadcast join (selectivity reaches the fact scan as
    * a join-key filter), and the OR-pair predicate then keeps only the
    * two cross directions. orders⨝lineitem is the one fact-fact join:
    * hash on orderkey. */
  def q7Volume(t: Tables, na: String = "NATION_9", nb: String = "NATION_11"): DataFrame = {
    val nations = Seq(na, nb)
    val sup = broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(t.nation.filter(col("n_name").isin(nations: _*))
          .select(col("n_nationkey"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation")))
    val cust = broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))
      .join(t.nation.filter(col("n_name").isin(nations: _*))
          .select(col("n_nationkey"), col("n_name").as("cust_nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("cust_nation")))
    t.lineitem
      .filter(col("l_shipdate").between(ts("1995-01-01"), ts("1996-12-31")))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"), col("l_shipdate"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
              (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(vol).cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 market share: one nation's share of regional revenue for a
    * part type, by order year. The share is a ratio of two conditional
    * exact-decimal sums computed in ONE aggregation pass (no second
    * scan, no join of two aggregates). */
  def q8Share(t: Tables, nation: String = "NATION_9", region: String = "ASIA",
              ptype: String = "ECONOMY"): DataFrame = {
    val pt = broadcast(t.part.filter(col("p_type") === ptype).select(col("p_partkey")))
    val cust = broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))
      .join(t.nation.select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(t.region.filter(col("r_name") === region).select(col("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey")))
    val sup = broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(t.nation.select(col("n_nationkey"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation")))
    t.lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(t.orders
          .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === nation, vol).otherwise(lit(0).cast(P)))
          .cast(DoubleType) /
        sum(vol).cast(DoubleType)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9 product profit (adapted: no partsupp, so supply cost is the
    * part's retail price × quantity at a 0.8 cost ratio — the shape,
    * a profit decomposition by supplier nation and year over a
    * name-substring part filter, is unchanged). Profit is computed as
    * difference of two exact decimal sums, one double subtraction at
    * the end. */
  def q9Profit(t: Tables, word: String = "red"): DataFrame = {
    val pt = broadcast(t.part.filter(col("p_name").contains(word))
      .select(col("p_partkey"), col("p_retailprice")))
    val sup = broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(t.nation.select(col("n_nationkey"), col("n_name").as("nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("nation")))
    val cost = (d(col("p_retailprice")) * d(col("l_quantity")) *
      lit(0.8).cast(R))
    t.lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(vol).cast(DoubleType) - sum(cost).cast(DoubleType)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q10 returned items: revenue lost to returns per customer over a
    * quarter, top 20. Fact-fact join hashes on orderkey; customer and
    * nation broadcast onto the aggregated (skinny) side, never the
    * line rows. */
  def q10Returns(t: Tables): DataFrame = {
    val perCust = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(t.orders
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1996-04-01"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(vol).cast(DoubleType).as("revenue"))
    perCust
      .join(broadcast(t.customer
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q13 customer order distribution: LEFT join with an extra join-side
    * predicate (not a WHERE — unmatched customers must survive with
    * count 0), then a distribution over the per-customer counts.
    * Aggregate-of-aggregate: both shuffles carry one row per customer /
    * per count. */
  def q13CustDist(t: Tables): DataFrame = {
    val perCust = t.customer.select(col("c_custkey"))
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15 top supplier: argmax over a derived revenue view. The view is
    * computed once and persisted (it feeds both the 1-row max and the
    * final equality filter — Catalyst evaluates duplicate subtrees
    * independently); the max joins back as a broadcast of one row.
    * Revenue is an exact decimal sum surfaced as double, so the
    * equality compare is bit-stable cross-engine. */
  def q15TopSupp(t: Tables): DataFrame = {
    val rev = t.lineitem
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).cast(DoubleType).as("total_revenue"))
      .persist() // feeds max + filter; lazy leak by design (see tfIdf)
    rev.crossJoin(broadcast(rev.agg(max(col("total_revenue")).as("mx"))))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 small-quantity revenue: lines of one brand whose quantity is
    * under 20% of that part's average quantity. The correlated
    * per-part average becomes a pre-aggregated join side (computed
    * only over the brand's parts — the correlation predicate is a part
    * attribute, so filtering first is equivalent and prunes the scan).
    * The average is exact-decimal-sum / count. */
  def q17SmallQty(t: Tables, brand: String = "Brand#3"): DataFrame = {
    val pt = broadcast(t.part.filter(col("p_brand") === brand).select(col("p_partkey")))
    val lines = t.lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .persist() // feeds per-part avg + the filtered sum (see tfIdf)
    val avgQty = lines.groupBy(col("l_partkey").as("ap"))
      .agg((sum(d(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"))
    lines.join(broadcast(avgQty), col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Q18 large-volume orders: IN-on-aggregate as a join against the
    * HAVING-filtered per-order quantity sums — one extra hash on
    * orderkey, no row multiplication, and the big-order frame is tiny
    * (99.9th percentile threshold) so it broadcasts. */
  def q18BigOrder(t: Tables, minQty: Double = 250.0): DataFrame = {
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19 discounted revenue: three-arm OR-of-ANDs over part attributes
    * × line quantity. One broadcast hash join on partkey; the arms are
    * a residual filter evaluated map-side inside codegen. */
  def q19Disc(t: Tables): DataFrame = {
    val arm = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    t.lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#1", 1, 15, 1, 11) || arm("Brand#12", 1, 25, 10, 30) ||
        arm("Brand#23", 1, 35, 20, 40))
      .agg(sum(vol).cast(DoubleType).as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** Q22 idle customers (adapted: no c_phone, so the cohort key is
    * c_custkey % 7 and "idle" means no order since 2001): above-average
    * positive balances, anti-joined against recent orders, grouped into
    * cohorts. The global average is a 1-row broadcast; the anti join
    * hashes on custkey. */
  def q22Idle(t: Tables): DataFrame = {
    val avgBal = t.customer.filter(col("c_acctbal") > 0)
      .agg((sum(d(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("avg_bal"))
    val recent = t.orders.filter(col("o_orderdate") >= ts("2001-01-01"))
      .select(col("o_custkey"))
    t.customer.select(col("c_custkey"), col("c_acctbal"))
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 7).as("cohort"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cohort"))
  }
}
