package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.streaming.VecIngest

/** Partition pruning across the base∪delta union (the VecIngest search
  * path). Two findings pinned:
  *
  *  1. DPP DOES cross Union: a cid join above `assignmentsWithDelta`
  *     plants a dynamicpruning PartitionFilter on BOTH partitioned
  *     scans — a probe reads nprobe cells of each layout, not two full
  *     indexes. (The initial round-10 hypothesis was the opposite; this
  *     spec is the falsification record.)
  *  2. The rule needs a SELECTIVE predicate on the probing side —
  *     q46's `rn <= nprobe` filter qualifies; a bare LIMIT does not
  *     (scans fall back to isnotnull-only and read everything). Pinned
  *     so nobody "simplifies" a probe-side filter into a limit.
  */
class UnionDppSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val idx = IvfIndex.ensure(spark, sf)
  private lazy val deltaDir: String = {
    val delta = Tables.embeddings(spark, sf).limit(5)
      .withColumn("vec_id", col("vec_id") + 900000L)
    val d = java.nio.file.Files.createTempDirectory("dppdelta").toString
    VecIngest.assignBatch(delta, idx, d, 0L)
    d
  }

  private def partitionedScans(plan: String): Seq[String] =
    plan.linesIterator.filter(l => l.contains("FileScan") &&
      (l.contains("/assignments") || l.contains("dppdelta"))).toSeq

  test("DPP crosses the union when the probe side is filter-selective") {
    val probeCells =
      IvfIndex.centroids(spark, idx).filter(col("cid") < 2).select("cid")
    val joined = VecIngest.assignmentsWithDelta(spark, idx, deltaDir)
      .join(probeCells, "cid")
    val scans = partitionedScans(joined.queryExecution.executedPlan.toString)
    assert(scans.size >= 2, "expected both the base and delta scans in the plan")
    scans.foreach(l => assert(l.contains("dynamicpruning"),
      s"scan without DPP filter: ${l.take(300)}"))
    // and the pruned read returns exactly the probed cells' rows
    assert(joined.select("cid").distinct().collect().map(_.getInt(0)).toSet
      .subsetOf(Set(0, 1)))
  }

  test("a bare LIMIT on the probe side does NOT trigger DPP (known rule shape)") {
    val probeCells = IvfIndex.centroids(spark, idx).limit(2).select("cid")
    val joined = VecIngest.assignmentsWithDelta(spark, idx, deltaDir)
      .join(probeCells, "cid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("dynamicpruning"),
      "LIMIT started triggering DPP — great; update the VecIngest note and this pin")
  }
}
