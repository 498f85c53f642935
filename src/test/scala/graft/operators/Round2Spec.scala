package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels each node with its component min") {
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val r = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("pointer jumping converges on a long path well under maxIter") {
    // a 64-node path has diameter 63; hash-to-min must close it in <=25
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val r = Components.connectedComponents(edges, maxIter = 25)
      .as[(Long, Long)].collect()
    assert(r.length == 64 && r.forall(_._2 == 1L))
  }

  test("loop state is freed: at most one cached label copy survives") {
    // each round localCheckpoints its label frame; without the explicit
    // per-round unpersist a K-round run leaves K+2 cached RDDs alive
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    Components.connectedComponents(edges, maxIter = 25).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the returned final label frame may remain cached
    assert(after - before <= 1, s"leaked ${after - before} cached RDDs")
  }

  test("hierarchy flatten: roots, depths and paths on a handmade tree") {
    //      1            10 (self-parent root)
    //     / \            |
    //    2   3          11
    //        |
    //        4
    val edges = Seq((1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(1L)),
      (4L, Some(3L)), (10L, Some(10L)), (11L, Some(10L)))
      .toDF("node", "parent")
    val r = Components.hierarchyFlatten(edges)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(r == Set(
      (1L, 1L, 0L, "1"), (2L, 1L, 1L, "1/2"), (3L, 1L, 1L, "1/3"),
      (4L, 1L, 2L, "1/3/4"), (10L, 10L, 0L, "10"), (11L, 10L, 1L, "10/11")))
  }

  test("hierarchy flatten: pointer doubling resolves a deep chain in O(log d) rounds") {
    // 200-deep chain; 20 maxIter would NOT suffice for one-step walking
    val edges = (1L to 200L).map(i => (i, Some(i - 1))).toDF("node", "parent")
      .union(Seq((0L, Option.empty[Long])).toDF("node", "parent"))
    val r = Components.hierarchyFlatten(edges, maxIter = 12)
      .filter(col("node") === 200L)
      .as[(Long, Long, Long, String)].head()
    assert(r._2 == 0L && r._3 == 200L && r._4.startsWith("0/1/2/"))
  }

  test("copurchase clusters: ids are component minima, sizes consistent") {
    val r = Components.copurchaseClusters(tables).collect()
    assert(r.nonEmpty)
    val byCluster = r.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid) // label == min member
      assert(rows.forall(_.getLong(2) == rows.length)) // size column agrees
    }
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join keeps all clicks in (p_ts-1h, p_ts], zeros elsewhere") {
    val ev = Seq(
      (1L, 100L, "purchase", ts("2024-01-01 12:00:00"), 0.0),
      (1L, 1L, "click", ts("2024-01-01 11:00:00"), 1.0),  // exactly -1h: OPEN bound, excluded
      (1L, 2L, "click", ts("2024-01-01 11:00:01"), 2.0),  // in range
      (1L, 3L, "click", ts("2024-01-01 12:00:00"), 4.0),  // same instant: included
      (1L, 4L, "click", ts("2024-01-01 12:00:01"), 8.0),  // after: excluded
      (2L, 5L, "click", ts("2024-01-01 11:30:00"), 16.0), // other user
      (3L, 200L, "purchase", ts("2024-01-01 09:00:00"), 0.0) // no clicks at all
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val got = RangeJoin.clicksBefore(ev).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getDouble(2)))).toMap
    assert(got(100L) == ((2L, 6.0)))
    assert(got(200L) == ((0L, 0.0)))
  }

  test("bucketed plan matches the naive range-predicate join on real data") {
    val naive = {
      val ev = tables.events
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value"))
      p.join(c, Seq("user_id"), "left")
        .filter(col("c_ts").isNull ||
          (col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") <= col("p_ts")))
      // naive left-join-then-filter drops purchases whose every click is
      // out of range, so compare only the matched aggregate rows
        .filter(col("c_ts").isNotNull)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .as[(Long, Long)].collect().toMap
    }
    val bucketed = RangeJoin.clicksBeforePurchase(tables)
      .select("purchase_id", "n_clicks").as[(Long, Long)].collect().toMap
    naive.foreach { case (id, n) => assert(bucketed(id) == n, s"purchase $id") }
    bucketed.filter(_._2 > 0).keys.foreach(id => assert(naive.contains(id)))
  }
}

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel requires strict stage ordering per user") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE view -> stalls at view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")), // no click after view
      // user 3: view only
      (3L, "view", ts("2024-01-01 10:00:00")),
      // user 4: purchase only -> not even in stage 1
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.funnelOf(ev).as[(Long, Long, Long)].head()
    assert(r == ((3L, 1L, 1L))) // 3 viewers, 1 ordered click, 1 ordered purchase
  }

  test("zscore: per-group mean ~0 and unit variance") {
    val r = EventAnalytics.zscore(tables)
      .groupBy("event_type")
      .agg(avg(col("z")).as("m"), avg(col("z") * col("z")).as("v"))
      .collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(1)) < 1e-9, s"mean ${row.getDouble(1)}")
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-6, s"var ${row.getDouble(2)}")
    }
  }

  test("inverted index postings are sorted and df matches posting length") {
    val r = TextAnalysis.invertedIndex(tables, dfLo = Some(2), dfHi = Some(50)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val ids = row.getString(2).split(",").map(_.toLong)
      assert(ids.length == row.getLong(1))
      assert(ids.sorted.sameElements(ids))
    }
  }
}

class Round2TextSpec extends SparkSpec {
  import spark.implicits._

  test("pii redact removes every email and phone it counted") {
    val r = TextAnalysis.piiRedact(tables)
    // every row got the synthetic footer, so >=1 email and >=1 phone
    val bad = r.filter(col("n_emails") < 1 || col("n_phones") < 1).count()
    assert(bad == 0)
  }

  test("tfidf ranks doc-specific terms above corpus-wide stopwords") {
    val r = TextAnalysis.tfIdf(tables)
      .select("doc_id", "rnk", "term").as[(Long, Long, String)].collect()
    assert(r.nonEmpty)
    // top-ranked terms should rarely be the universal stopwords
    val top1 = r.filter(_._2 == 1L).map(_._3)
    val stop = Set("the", "and", "of", "to", "a")
    assert(top1.count(stop) < top1.length / 2)
  }

  test("decontaminate drops hub shingles above the df cap, via broadcast anti-join") {
    // The 4-word hub phrase yields two shingles with df 13 (> cap 10);
    // docs 2..12 share ONLY those with the bench doc, doc 1 also shares
    // two RARE shingles. Uncapped, every hub doc would be reported; the
    // cap keeps just the genuine overlap.
    val hub = "alpha beta gamma delta"
    val rare = "quux corge grault garply" // two overlapping 3-gram shingles
    val docs = ((2L to 12L).map(i => (i, s"$hub filler$i end$i")) ++
      Seq((1L, s"$hub $rare"), (100L, s"other lead-in $hub end $rare")))
      .toDF("doc_id", "text")
    val frame = TextAnalysis.decontaminateDocs(docs, maxDf = 10)
    val rows = frame.select("corpus_doc", "bench_doc", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 100L, 2L)), s"got $rows")
    val uncapped = TextAnalysis.decontaminateDocs(docs, maxDf = 1000)
      .select("corpus_doc").as[Long].collect().toSet
    assert(uncapped == (1L to 12L).toSet, s"uncapped control: $uncapped")
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hub cap should be a broadcast anti-join:\n$plan")
  }

  test("stratified sample caps every stratum near the target") {
    val full = tables.documents.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sampled = Curation.stratifiedSample(tables, target = 60)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    sampled.foreach { case (lang, n) =>
      val orig = full(lang)
      if (orig <= 60) assert(n == orig, s"$lang under target must keep all")
      // hash sampling is binomial around the target; allow wide slack
      else assert(n <= 3 * 60 && n > 0, s"$lang sampled $n of $orig")
    }
  }
}
