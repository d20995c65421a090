package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The two-level centroid-tree build dial (round 17, VERDICT r16 #4):
  * `graft.ivf.tree=1` bounds the build's driver collect and broadcast at
  * O(√K·dim). Pins: the tree index owns its content address and artifact
  * shape; assignment conservation; and — IvfPruneSpec-style — the
  * persisted assignment is EXACTLY the two-stage argmin an independent
  * driver-side recompute derives from the persisted coarse + sub
  * centroids (same (d2, id)-min tie order, same sequential-fold doubles
  * as the native SqDist and the DuckDB replay). */
class IvfTreeSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("tree build: own content address, artifacts, conservation, selection identity") {
    spark.conf.set("graft.ivf.tree", "1")
    try {
      val dir = IvfIndex.ensure(spark, sf)
      val k = IvfIndex.kFor(spark, sf)
      // tree flag is part of the content address — never serves (or
      // clobbers) a flat index
      assert(dir != IvfIndex.indexDir(sf, k))
      assert(Files.exists(Paths.get(s"$dir/coarse.parquet")))
      val cent = spark.read.parquet(s"$dir/centroids.parquet")
      assert(cent.columns.toSet == Set("cid", "cv", "ccid"))
      val coarse = spark.read.parquet(s"$dir/coarse.parquet")
        .select(col("ccid"), col("cv"))
        .as[(Int, Seq[Double])].collect().sortBy(_._1)
      assert(coarse.length == IvfIndex.kcFor(k))
      // global cids are dense 0..|cent|-1 and every ccid exists in coarse
      val centArr = cent.select("cid", "cv", "ccid")
        .as[(Int, Seq[Double], Int)].collect().sortBy(_._1)
      assert(centArr.map(_._1).toSeq == centArr.indices)
      assert(centArr.map(_._3).toSet.subsetOf(coarse.map(_._1).toSet))
      // conservation: every corpus vector assigned exactly once
      val asg = IvfIndex.assignments(spark, dir)
        .select(col("vec_id"), col("v"), col("cid"))
        .as[(Long, Seq[Double], Int)].collect()
      assert(asg.length == Tables.embeddings(spark, sf).count())
      assert(asg.map(_._1).distinct.length == asg.length)
      // selection identity vs an independent recompute: sequential
      // (a-b)² left fold — the same accumulation order as the native
      // SqDist and the oracle's list_reduce
      def d2(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }
        s
      }
      asg.foreach { case (id, v, gotCid) =>
        val ccid = coarse.map { case (cc, cv) => (d2(v, cv), cc) }.min._2
        val want = centArr.filter(_._3 == ccid)
          .map { case (cid, cv, _) => (d2(v, cv), cid) }.min._2
        assert(gotCid == want, s"vec $id: got cid $gotCid, two-stage argmin $want")
      }
    } finally {
      spark.conf.unset("graft.ivf.tree")
    }
  }

  test("tree-dial consumers run green (q46/q68/q79 smoke over the tree index)") {
    spark.conf.set("graft.ivf.tree", "1")
    try {
      Seq("q46_ivf_ann", "q68_semdedup", "q79_semdedup_np").foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q empty under tree")
      }
    } finally spark.conf.unset("graft.ivf.tree")
  }

  test("localKMeans is deterministic and converges on a separable fixture") {
    val pts = Array(
      Array(0.0, 0.0), Array(0.2, 0.0), Array(0.0, 0.2),   // cluster A
      Array(10.0, 10.0), Array(10.2, 10.0), Array(10.0, 10.2)) // cluster B
    val a = IvfIndex.localKMeans(pts, 2, 3)
    val b = IvfIndex.localKMeans(pts.map(_.clone()), 2, 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // deterministic
    val sorted = a.sortBy(_.sum)
    assert(math.abs(sorted(0)(0) - 0.0667) < 0.01 &&
           math.abs(sorted(1)(0) - 10.0667) < 0.01)
    // k = n degenerates to the points themselves
    val idk = IvfIndex.localKMeans(pts, pts.length, 2)
    assert(idk.map(_.toSeq).sortBy(_.sum).toSeq ==
           pts.map(_.toSeq).sortBy(_.sum).toSeq)
  }
}
