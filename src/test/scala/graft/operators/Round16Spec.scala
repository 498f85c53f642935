package graft.operators

import graft.SparkSpec

class Round16Spec extends SparkSpec {

  test("ivfKnn2lExact: recall vs brute-force truth, ranks dense from 1, deterministic") {
    val k = 5
    val truth = Similarity.knnCosine(tables, k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.ivfKnn2lExact(tables, k).collect()
    assert(got.nonEmpty)
    // ranks dense from 1 per query, neighbors distinct, never self
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.map(_.getLong(2)).distinct.length == rows.length)
      assert(!rows.exists(_.getLong(2) == q))
    }
    val pairs = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = pairs.intersect(truth).size.toDouble / truth.size
    info(s"ivfKnn2lExact recall@$k vs brute force: $recall")
    assert(recall >= 0.5, s"exact two-level recall collapsed: $recall")
    // integer-deterministic: a second independent build is bit-identical
    val again = Similarity.ivfKnn2lExact(tables, k).collect()
    assert(again.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }
}
