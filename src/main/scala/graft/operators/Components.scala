package graft.operators

import graft.sources.Tables
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Connected components over an edge list — the clustering step that
  * turns pairwise near-duplicate MATCHES (Dedup.minhashPairs etc.) into
  * duplicate GROUPS, and the generic graph kernel behind co-purchase /
  * co-occurrence analysis.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round
  * every node takes the min of its own label, its neighbors' labels,
  * and its label's label (one extra self-join — the "hash-to-min"
  * shortcut). Plain neighbor propagation needs O(diameter) rounds; the
  * label-of-label jump collapses already-discovered chains, giving
  * O(log n) rounds on path-like components — the difference between 6
  * and 60 shuffles on a 100 TB edge set. Each round is two equi-joins +
  * one aggregate (all shuffle on node id, so AQE handles skewed hub
  * nodes); state per round is one (node, lbl) row per node, persisted
  * and explicitly unpersisted so lineage doesn't re-execute the whole
  * history each iteration.
  *
  * The driver-side loop holds only a change COUNT per round (one
  * action), never row data; convergence is data-dependent but bounded
  * by maxIter. Each round's state is freed once the next round
  * materializes; only the FINAL label frame stays cached — it IS the
  * returned data (lineage was severed), so the caller owns its
  * lifetime. Labels converge to the component's minimum node id —
  * deterministic regardless of execution order, which is what makes the
  * result oracle-checkable against a recursive-CTE transitive closure.
  */
object Components extends Logging {

  /** Release the cached blocks behind a `localCheckpoint`'ed frame.
    * A checkpointed Dataset's plan is a [[LogicalRDD]] whose RDD holds
    * the materialized blocks; `Dataset.unpersist` can't reach them
    * (the Dataset-level cache manager never saw them), so without this
    * every iteration of a loop leaks one full copy of its state for
    * the lifetime of the session. Only call once NOTHING downstream
    * can recompute through the frame — checkpointing severed the
    * lineage, so evicted blocks are gone for good. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }

  /** Resolve components of an undirected edge list (columns `a`, `b`).
    * Returns (node, cluster_id = min node id reachable). Only nodes
    * with at least one edge appear (singletons carry no information
    * and would dominate the output at scale).
    *
    * Lineage discipline: the label frame is localCheckpoint'ed every
    * round. The pointer-jump self-join references the round's frame
    * twice, so WITHOUT truncation the logical plan doubles per
    * iteration — exponential analysis cost long before any data moves
    * (a 20-round run materializes a 2^20-node plan). On a real cluster
    * swap localCheckpoint for a reliable `checkpoint` dir so executor
    * loss can't sever the truncated lineage. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the incoming edge plan ONCE: the symmetrization union
    // references it twice, and Spark computes duplicate subtrees
    // independently (ReuseExchange only kicks in for identical shuffle
    // outputs) — for an expensive edge pipeline that doubles its cost
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    // persist sym already hashed by dst: the per-round neighbor join
    // then re-shuffles only the (small) label frame, never the edges
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("dst"))
      .persist()
    // round 0 folded into init: label = min(self, direct neighbors)
    var lab = sym.groupBy(col("src").as("node"))
      .agg(least(col("node"), min(col("dst"))).as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(lab.select(col("node").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("nlbl")).as("nbr_lbl"))
      // carry the pre-round label through the round so convergence is a
      // plain aggregate at the end, not one more join against old state
      val stepped = lab
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
      // pointer jump TWICE: lbl := lbl(lbl(lbl)) — each jump is one more
      // small self-join inside the same job and multiplies how far a
      // round reaches, cutting the round count (each round is a full
      // job whose scheduling + small shuffles dominate at the tail
      // where only a handful of labels still move). Intermediates are
      // NOT checkpointed — recomputing cheap joins inside one job beats
      // an extra materialization job per round; the lazy checkpoint of
      // the final frame still bounds the plan at one round's depth.
      val jumped = (1 to 2).foldLeft(stepped) { (cur, _) =>
        cur.join(cur.select(col("node").as("lbl"), col("lbl").as("ll")),
            Seq("lbl"), "left")
          .select(col("node"), col("old"), coalesce(col("ll"), col("lbl")).as("lbl"))
      }.localCheckpoint(false) // materialized by the count below: 1 job/round
      changed = jumped.filter(col("lbl") =!= col("old")).count()
      // the count above materialized this round's checkpoint; the
      // previous round's blocks can never be read again — free them
      // now or the loop retains O(rounds) copies of the label state
      freeCheckpoint(lab)
      lab = jumped.select(col("node"), col("lbl"))
      iter += 1
    }
    if (changed > 0)
      logWarning(s"connectedComponents exhausted maxIter=$maxIter with " +
        s"$changed labels still moving — returned labels are NOT converged " +
        "(downstream dedup would under-merge); raise maxIter")
    sym.unpersist()
    freeCheckpoint(e) // sym (materialized) was its only consumer
    lab
  }

  /** Co-purchase part clusters: parts are connected when they appear
    * in the same order at least twice (the repeat threshold prunes the
    * one-off noise that would otherwise glue everything into a single
    * giant component). Edge generation is an equi-join on the order key
    * — per-order fan-out is (lines choose 2), bounded by order size,
    * never a global cross product. */
  def copurchaseClusters(t: Tables, minCo: Int = 2): DataFrame = {
    // Repartition on the join key BEFORE the self-join: the projected
    // two-column frame is small enough to broadcast, and a broadcast
    // join would stream the other side's single-row-group scan through
    // ONE task — the whole pair explosion runs serially. Pre-hashing by
    // l_orderkey forces the streamed side wide; the build side can
    // still broadcast. (On a multi-split cluster table the scan is
    // already parallel and this reshuffle is one pass of two longs/row.)
    val l = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .repartition(t.spark.sparkContext.defaultParallelism, col("l_orderkey"))
    val edges = l.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(l.select(col("l_orderkey"), col("l_partkey").as("b")), Seq("l_orderkey"))
      .filter(col("b") > col("a"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
      .select(col("a"), col("b"))
    val w = Window.partitionBy(col("cluster_id"))
    connectedComponents(edges)
      .select(col("node").as("part_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .orderBy(col("part_id"))
  }
}
