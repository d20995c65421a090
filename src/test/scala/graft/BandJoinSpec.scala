package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Warehouse
import graft.plans.BandJoin

/** The custom band-join physical operator (BandJoinPlan → BandJoinExec via
  * extraStrategies): result equality against a plain range-condition join,
  * boundary inclusivity, per-key grouping edges, self-join attribute
  * freshness, and the plan actually containing the custom node. */
class BandJoinSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("crafted edges: boundaries inclusive, empty groups, multi-key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),  // window [09:00, 10:00]
      (1L, ts("2024-01-01 12:00:00"), "p2"),  // window [11:00, 12:00]
      (2L, ts("2024-01-01 10:00:00"), "p3"),  // key with no right rows
      (3L, ts("2024-01-01 10:00:00"), "p4")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "c1"),  // == lower bound of p1: IN
      (1L, ts("2024-01-01 10:00:00"), "c2"),  // == upper bound of p1: IN
      (1L, ts("2024-01-01 08:59:59"), "c3"),  // just below p1's window: OUT
      (1L, ts("2024-01-01 12:00:01"), "c4"),  // just above p2's window: OUT
      (3L, ts("2024-01-01 09:30:00"), "c5"),
      (4L, ts("2024-01-01 09:30:00"), "c6")   // key with no left rows
    ).toDF("k", "t", "tag")

    val pairs = BandJoin.bandJoin(left, right.toDF("rk", "rt", "rtag"),
        Seq("k" -> "rk"), "t", "rt", -3600L * 1000000, 0L)
      .select(col("tag"), col("rtag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("p1", "c1"), ("p1", "c2"), ("p4", "c5")),
      s"got $pairs")
  }

  test("null timestamps: never match; left-outer null-extends them") {
    val left = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), "ok"),
      (1L, Option.empty[Timestamp], "lnull"),   // null left time
      (2L, Option(ts("2024-01-01 10:00:00")), "nomatch")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Option(ts("2024-01-01 09:30:00")), "c1"),
      (1L, Option.empty[Timestamp], "rnull"),   // null right time: no match ever
      (1L, Option(ts("1970-01-01 00:00:30")), "epoch") // would match an epoch-0 bug
    ).toDF("rk", "rt", "rtag")
    val win = (-3600L * 1000000, 0L)

    val inner = BandJoin.bandJoin(left, right, Seq("k" -> "rk"), "t", "rt",
        win._1, win._2)
      .select("tag", "rtag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inner == Set(("ok", "c1")), s"inner got $inner")

    val outer = BandJoin.bandJoin(left, right, Seq("k" -> "rk"), "t", "rt",
        win._1, win._2, leftOuter = true)
      .select("tag", "rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(outer == Set(("ok", Some("c1")), ("lnull", None), ("nomatch", None)),
      s"outer got $outer")
  }

  test("matches the plain range-condition join on the events table") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    val custom = BandJoin.bandJoin(purchases, clicks,
        Seq("user_id" -> "c_user"), "purchase_ts", "click_ts",
        -3600L * 1000000, 0L)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == plain,
      s"drift: ${(custom -- plain).take(3)} / ${(plain -- custom).take(3)}")
    assert(custom.nonEmpty)
  }

  test("q49b (custom operator) equals q49 (hour-bucket rewrite) and plans BandJoinExec") {
    val a = Warehouse.q49b_band_join_exec(spark, sf).collect().map(_.toSeq).toSet
    val b = Warehouse.q49_interval_join(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b)
    // physical nodes print without the Exec suffix (TreeNode.nodeName)
    val plan = Warehouse.q49b_band_join_exec(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), s"custom operator missing from plan:\n$plan")
  }

  test("forced spill of the right group buffer leaves results identical") {
    // The group buffer is SortMergeJoin's spill-aware array; force every
    // group straight through the spill path (1 in-memory row, spill after
    // 2) and require bit-identical output vs the all-in-memory run —
    // covers inner, LEFT OUTER, and matchLatest (as-of) modes.
    val normal  = Warehouse.q49b_band_join_exec(spark, sf).collect().map(_.toSeq)
    val outerN  = Warehouse.q49c_band_left_outer(spark, sf).collect().map(_.toSeq)
    val asofN   = Warehouse.q47b_asof_exec(spark, sf).collect().map(_.toSeq)
    val keys = Seq(
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2")
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      assert(Warehouse.q49b_band_join_exec(spark, sf).collect().map(_.toSeq)
        .sameElements(normal), "inner band join changed under forced spill")
      assert(Warehouse.q49c_band_left_outer(spark, sf).collect().map(_.toSeq)
        .sameElements(outerN), "left-outer band join changed under forced spill")
      assert(Warehouse.q47b_asof_exec(spark, sf).collect().map(_.toSeq)
        .sameElements(asofN), "as-of band join changed under forced spill")
    } finally keys.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("self-join from the same DataFrame gets fresh attributes") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 100L),
                 (1L, ts("2024-01-01 10:30:00"), 101L))
      .toDF("k", "t", "id")
    val out = BandJoin.bandJoin(
        df.select(col("k"), col("t"), col("id")),
        df.select(col("k").as("rk"), col("t").as("rt"), col("id").as("rid")),
        Seq("k" -> "rk"), "t", "rt", 0L, 3600L * 1000000)
      .select("id", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each row joins itself and 10:00 joins 10:30 (within +1h)
    assert(out == Set((100L, 100L), (100L, 101L), (101L, 101L)), s"got $out")
  }

  test("BandJoinExec runs inside WholeStageCodegen and equals the iterator path") {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    // executed-plan walk: the band join must sit under a WholeStageCodegen
    // subtree (fused with its downstream operators)
    def bandInWSCG(p: SparkPlan, in: Boolean): Option[Boolean] = p match {
      case w: WholeStageCodegenExec => w.children.flatMap(bandInWSCG(_, true)).headOption
      case a: AdaptiveSparkPlanExec => bandInWSCG(a.executedPlan, in)
      case q: QueryStageExec        => bandInWSCG(q.plan, false)
      case _: graft.plans.BandJoinExec => Some(in)
      case other => other.children.flatMap(bandInWSCG(_, in)).headOption
    }
    val df = Warehouse.q49b_band_join_exec(spark, sf)
    val withCodegen = df.collect().map(_.toSeq)
    assert(bandInWSCG(df.queryExecution.executedPlan, false).contains(true),
      "BandJoinExec is not inside a WholeStageCodegen stage")
    // same rows with whole-stage codegen disabled (iterator doExecute path)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val q = Warehouse.q49b_band_join_exec(spark, sf)
      assert(q.collect().map(_.toSeq).sameElements(withCodegen),
        "codegen and iterator paths diverge")
      assert(bandInWSCG(q.queryExecution.executedPlan, false).contains(false))
      assert(Warehouse.q49c_band_left_outer(spark, sf).collect().length ==
        { spark.conf.unset("spark.sql.codegen.wholeStage")
          Warehouse.q49c_band_left_outer(spark, sf).collect().length })
    } finally spark.conf.unset("spark.sql.codegen.wholeStage")
  }
}
