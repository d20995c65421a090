package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Properties of the connected-components near-dup clustering (q37):
  * endpoint agreement for every candidate pair, min-id canonicality,
  * partition integrity, and survivor count = cluster count. */
class NeardupClusterSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val clusters = TextOps.q37_neardup_clusters(spark, sf)
  private lazy val byDoc = clusters.collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

  test("every near-dup pair's endpoints land in the same cluster") {
    val pairs = TextOps.q34_ngram_jaccard(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a)._1 == byDoc(b)._1, s"pair ($a,$b) split across clusters")
    }
  }

  test("cluster ids are the min member; survivors are exactly one per cluster") {
    val members = byDoc.toSeq.groupBy(_._2._1)
    members.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid is not its min member")
      assert(ms.count(_._2._3) == 1, s"cluster $cid has != 1 survivor")
      assert(ms.find(_._2._3).get._1 == cid)
      ms.foreach { case (_, (_, size, _)) => assert(size == ms.size) }
    }
    // every document appears exactly once
    assert(byDoc.size == Tables.documents(spark, sf).count())
    // and there is at least one non-trivial cluster on this data
    assert(members.exists(_._2.size > 1))
  }

  test("driver union-find and distributed propagation agree") {
    import TestSpark.spark.implicits._
    // chain, triangle, two singleton-free pairs, cross-links
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 31L), (4L, 5L), (5L, 1L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    def comp(threshold: Long) =
      TextOps.connectedComponents(edges, threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = comp(Long.MaxValue) // union-find path
    val big = comp(0L)              // contraction → hash-min path
    assert(small == big, s"paths disagree: $small vs $big")
    assert(small(5L) == 1L && small(12L) == 10L && small(21L) == 20L)
  }

  test("contraction rounds agree with direct union-find on adversarial graphs") {
    import TestSpark.spark.implicits._
    // worst cases for label propagation: a 400-node chain (diameter 400)
    // and a 100-node dense clique-ish cluster (the near-dup shape), plus
    // isolated pairs — mixed in one edge set
    val chain = (0L until 400L).sliding(2).map(s => (s.head, s.last)).toSeq
    val dense = for (i <- 1000L until 1100L; j <- i + 1 to 1099L if (i + j) % 7 < 3)
      yield (i, j)
    val pairsOnly = Seq((5000L, 5001L), (6000L, 6001L))
    val all = chain ++ dense ++ pairsOnly
    val edges = (all ++ all.map(p => (p._2, p._1))).toDF("src", "dst")
    def comp(threshold: Long) =
      TextOps.connectedComponents(edges, threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = comp(Long.MaxValue)      // driver union-find, no contraction
    val contractedUF = comp(all.size / 2) // contraction rounds → driver UF
    val contractedHM = comp(0L)           // contraction rounds → hash-min
    assert(direct == contractedUF, "contraction → union-find diverges")
    assert(direct == contractedHM, "contraction → hash-min diverges")
    assert(direct(399L) == 0L && direct(1099L) == 1000L && direct(5001L) == 5000L)
  }
}
