package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{BucketedLayout, HilbertLayout, ZOrderLayout}
import graft.superstore.{Exporter, WarehouseCache}

/** Measurement main for the UNIFIED maintenance tick (round 16, VERDICT
  * r15 #4) — the IncrMaint/ClusterMaint protocol with ONE daily verb:
  * every persisted family ingests its delta, then a single
  * [[Maintenance.tick]] applies every policy at once.
  *
  * Protocol (scratch copy of the sfDir star + the superstore Item tree;
  * base = key % 128 >= maxDays, day i ingests the % 128 == i slice):
  *  - day 0: ensure all families (4 bucketed, z-order, Hilbert, Item).
  *  - per day: append the delta through each family's own ingest verb
  *    (the Item tree ingests its calendar_id % maxDays slice once per
  *    run at day==cal slice), then ONE tick; the printed line carries
  *    each family's fired/held answer — the tick's own ledger.
  *  - runs until EVERY family has folded at least once, +1 quiesced day,
  *    capped at maxDays.
  *  - final fidelity: each maintained layout ≡ its merged source by
  *    value fingerprint (the family specs pin this per-fold; the ladder
  *    re-checks the composed end state).
  *
  * Usage: runMain graft.MaintTick <sfDir> <maxDays>
  */
object MaintTick {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxDays = if (args.length > 1) args(1).toInt else 16
    val scratch = "/root/repo/target/maint_tick"
    graft.Fs.deleteTree(java.nio.file.Paths.get(scratch))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k=v" — the Bench/Verify override hook: a
    // ladder run tightens the policy knobs so every family folds inside
    // the window (the realistic default-knob cadence is ClusterMaint's
    // sf30 ladder; THIS ladder proves the single-verb orchestration),
    // and the knobs used are recorded in the artifact line below.
    val overrides = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = overrides
      .foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    println(s"""{"conf_overrides":{${overrides.map { case (k, v) =>
      s""""$k":"$v"""" }.mkString(",")}}}""")
    spark.sparkContext.setLogLevel("WARN")
    // bucketed layouts are size-gated in the query path; the ladder
    // builds them unconditionally (it measures maintenance, not the gate)
    val src = s"$scratch/src"
    val tables = Seq(("lineitem", "l_orderkey"), ("orders", "o_orderkey"),
                     ("part", "p_partkey"))
    tables.foreach { case (t, k) =>
      Tables.table(spark, sfDir, t).filter(col(k) % 128 >= maxDays)
        .write.parquet(s"$src/$t.parquet")
    }
    Tables.clearCaches()

    // day 0: ensure every family
    val (_, tEnsure) = timed {
      BucketedLayout.ensure(spark, src)
      BucketedLayout.ensureOrderkey(spark, src)
      ZOrderLayout.ensureLineitem(spark, src)
      HilbertLayout.ensureLineitem3(spark, src)
    }
    val wh = WarehouseCache.get(spark)
    val (item, cal) = (wh("Item"), wh("Calendar"))
    val itemDir = s"$scratch/itemwh"
    def itemKey = col("calendar_id") % 128
    val itemBase = item.filter(itemKey >= maxDays)
    Exporter.persistItemPartitioned(itemBase, cal, itemDir)
    var itemRows = itemBase.count()
    println(s"""{"day":0,"ensure_s":${f"$tEnsure%.2f"}}""")

    val folded = scala.collection.mutable.Set[String]()
    val allFamilies = Maintenance.BucketedFamilies
      .map { case (t, k) => s"bucketed:$t/$k" } ++
      Seq("zorder:lineitem", "hilbert:lineitem", s"item-partitioned:$itemDir")
    var day = 0
    var quiesced = -1
    while (day < maxDays && (quiesced < 0 || day <= quiesced)) {
      // ingest: every family's own O(delta) verb
      val (_, tIngest) = timed {
        tables.foreach { case (t, k) =>
          val delta = Tables.table(spark, sfDir, t)
            .filter(col(k) % 128 === day)
          delta.write.mode("append").parquet(s"$src/$t.parquet")
          Tables.clearCaches()
          val freshDelta = Tables.table(spark, sfDir, t)
            .filter(col(k) % 128 === day)
          if (t == "lineitem") {
            BucketedLayout.appendDelta(spark, src, t, "l_partkey", freshDelta)
            BucketedLayout.appendDelta(spark, src, t, "l_orderkey", freshDelta)
            ZOrderLayout.appendDeltaLineitem(spark, src, freshDelta)
            HilbertLayout.appendDeltaLineitem3(spark, src, freshDelta)
          } else BucketedLayout.appendDelta(spark, src, t,
            if (t == "orders") "o_orderkey" else "p_partkey", freshDelta)
        }
        // the Item tree's daily batch: the calendar_id % 128 == day slice,
        // guarded by the metadata expected-count (the ADVICE r15 path)
        val itemDelta = item.filter(itemKey === day)
        itemRows += itemDelta.count()
        Exporter.appendItemPartitioned(
          item.filter(itemKey >= maxDays || itemKey <= day), itemDelta, cal,
          itemDir, expectedSourceRows = Some(itemRows))
      }
      // ONE tick for everything
      val (actions, tTick) = timed {
        Maintenance.tick(spark, src, Some(itemDir), Some(cal)) }
      actions.filter(_.fired).foreach(a => folded += s"${a.family}:${a.target}")
      if (quiesced < 0 && allFamilies.forall(folded)) quiesced = day + 1
      val cells = actions.map(a =>
        s""""${a.family}:${a.target.split('/').takeRight(2).mkString("/")}":${if (a.fired) s""""${a.detail}"""" else "\"held\""}""")
      println(
        s"""{"day":${day + 1},"ingest_s":${f"$tIngest%.2f"},""" +
        s""""tick_s":${f"$tTick%.2f"},"folded_total":${folded.size},""" +
        s""""actions":{${cells.mkString(",")}}}""")
      day += 1
    }

    // composed end-state fidelity: every maintained layout ≡ its source
    def fp(df: DataFrame): (Long, Long) = {
      val h = df.select(pmod(xxhash64(df.columns.sorted.map(col).toSeq: _*),
        lit(1000000000L)).as("h"))
      val r = h.agg(count(lit(1)), sum(col("h"))).head
      (r.getLong(0), r.getLong(1))
    }
    Tables.clearCaches()
    val zOk = fp(spark.read.parquet(ZOrderLayout.ensureLineitem(spark, src))) ==
      fp(Tables.table(spark, src, "lineitem"))
    val hOk = fp(spark.read.parquet(HilbertLayout.ensureLineitem3(spark, src))) ==
      fp(Tables.table(spark, src, "lineitem"))
    val itemCols = item.columns.map(col).toIndexedSeq
    val iOk = {
      val ingested = item.filter(itemKey >= maxDays || itemKey < day)
      val got = spark.read.parquet(s"$itemDir/Item_by_year").select(itemCols: _*)
      got.count() == ingested.count() && got.exceptAll(ingested).isEmpty &&
        ingested.exceptAll(got).isEmpty
    }
    println(
      s"""{"summary":true,"days":$day,"all_folded":${allFamilies.forall(folded)},""" +
      s""""zorder_eq_source":$zOk,"hilbert_eq_source":$hOk,"item_eq_source":$iOk}""")
    spark.stop()
  }
}
