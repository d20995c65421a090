package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The centroid-space-pruned assignment must be SELECTION-IDENTICAL to
  * the exhaustive crossJoin form — same (d2, cid)-argmin, same ties —
  * because the persisted index content (and everything the oracle replays
  * from it) rides on that equality. */
class IvfPruneSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def vecs = {
    graft.functions.Natives.registerAll(spark)
    Tables.embeddings(spark, sf).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "v", "cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2))).toSet

  private def centsFrom(filter: org.apache.spark.sql.Column)
      : Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    vecs.filter(filter).orderBy("vec_id")
      .as[(Long, Seq[Double])].collect().toSeq
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  test("pruned == exhaustive on 80 corpus-vector centroids") {
    import spark.implicits._
    val cent = centsFrom(col("vec_id") < 80)
    assert(cent.size >= IvfIndex.PruneMinK)
    val a = rows(IvfIndex.assign(vecs, cent.toDF("cid", "cv")))
    val b = rows(IvfIndex.assignPruned(vecs, cent))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("pruned == exhaustive on a strided centroid set (ties included)") {
    import spark.implicits._
    // every 6th vector — includes each centroid's own identical corpus
    // twin (distance 0 rows exercise the tie path: d2 equal ⇒ smaller cid)
    val cent = centsFrom(col("vec_id") % 6 === 0)
    assert(cent.size >= IvfIndex.PruneMinK)
    val a = rows(IvfIndex.assign(vecs, cent.toDF("cid", "cv")))
    val b = rows(IvfIndex.assignPruned(vecs, cent))
    assert(a == b)
  }

  test("assignVia dispatches: small K takes the exhaustive path unchanged") {
    import spark.implicits._
    val cent = centsFrom(col("vec_id") < 16)
    val a = rows(IvfIndex.assign(vecs, cent.toDF("cid", "cv")))
    val b = rows(IvfIndex.assignVia(vecs, cent))
    assert(a == b)
  }

  // ---- top-np membership (round 16, q79's expansion) -------------------

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("topCells: np memberships contain the rank-1 assignment; sizes exact") {
    import spark.implicits._
    val cent = centsFrom(col("vec_id") % 6 === 0)
    val m = cells(IvfIndex.topCells(vecs, cent.toDF("cid", "cv"), 2))
    assert(m.nonEmpty && m.values.forall(_.size == 2))
    val r1 = IvfIndex.assign(vecs, cent.toDF("cid", "cv"))
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r1.forall { case (id, cid) => m(id).contains(cid) })
  }
}
