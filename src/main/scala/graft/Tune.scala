package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a few representative queries under session-config
  * variants to locate the per-query fixed cost (scheduling, AQE rounds,
  * shuffle task count). Usage: runMain graft.Tune <sfDir> <q1,q2,...>
  */
object Tune {
  /** `runMain graft.Tune sums <sfDir>`: isolate the aggregation arithmetic
    * cost — identical groupBy shape, decimal vs double vs long fixed-point
    * revenue. */
  def sumShapes(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir)
    val shapes = Seq(
      "decimal" -> (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(BigDecimal(1)).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2)))),
      "double" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
      "longfp" -> (round(col("l_extendedprice") * 100).cast(LongType) *
        (lit(100L) - round(col("l_discount") * 100).cast(LongType))))
    val times = shapes.map { case (n, e) =>
      val df = li.groupBy("l_partkey").agg(sum(e).as("s"))
      df.count()
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      f"$n=${samples.min}%.3f"
    }
    println(s"TUNE sums ${times.mkString(" ")}")
    spark.stop()
  }

  /** `runMain graft.Tune q12parts <sfDir>`: cumulative stage timing. */
  def q12Parts(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rev = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2)))
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("p_partkey")).agg(sum(rev).as("rev_d"))
    val joined = agg.join(
      broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_name")), Seq("p_partkey"))
    val ranked = joined.withColumn("rnk",
      rank().over(Window.orderBy(col("rev_d").desc)).cast(IntegerType))
    val filtered = ranked.filter(col("rnk") <= 10)
    val stages = Seq("agg" -> agg, "join" -> joined, "rank" -> ranked,
      "filter" -> filtered)
    val times = stages.map { case (n, df) =>
      df.count()
      val s = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      f"$n=${s.min}%.3f"
    }
    println(s"TUNE q12parts ${times.mkString(" ")}")
    spark.stop()
  }

  /** `SPARK_DRIVER_MEM=1g sbt "runMain graft.Tune spill <sfDir>"`:
    * constrained-memory audit — run every query once under a listener and
    * report per-query shuffle spill (memory/disk bytes) and failures.
    * Passing = no OOM and bounded spill (operators degrade to disk, not
    * to death), the behavior a production executor needs under pressure. */
  def spillAudit(sfDir: String): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { mem.addAndGet(m.memoryBytesSpilled); disk.addAndGet(m.diskBytesSpilled) }
      }
    })
    var failed = 0
    SparkEntry.queries.toSeq.filterNot(_._1.startsWith("ss_")).sortBy(_._1)
      .foreach { case (name, fn) =>
        val m0 = mem.get; val d0 = disk.get
        try {
          fn(spark, sfDir).count()
          val dm = mem.get - m0; val dd = disk.get - d0
          if (dm + dd > 0) println(f"SPILL $name mem=${dm / 1e6}%.1fMB disk=${dd / 1e6}%.1fMB")
        } catch { case e: Throwable =>
          failed += 1; println(s"SPILL_FAIL $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
        }
      }
    println(f"SPILL_TOTAL mem=${mem.get / 1e6}%.1fMB disk=${disk.get / 1e6}%.1fMB failed=$failed heap=${Runtime.getRuntime.maxMemory / 1e9}%.1fGB")
    spark.stop()
  }

  /** `runMain graft.Tune bsweep <sfDir>`: broadcast-threshold sweep for
    * the star join (UNhinted lineitem ⋈ part), timing the plan Catalyst
    * picks as spark.sql.autoBroadcastJoinThreshold moves through
    * {off, 64KB, 1MB, 10MB(default)} — locates the dim-size crossover
    * where broadcast beats shuffle at this scale and backs the explicit
    * broadcast() hints used across the suite. */
  def broadcastSweep(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val variants = Seq("-1" -> "off", "65536" -> "64KB",
      "1048576" -> "1MB", "10485760" -> "10MB")
    def starJoin() = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("l_extendedprice")).as("s"))
    starJoin().count() // warm
    val cells = variants.map { case (v, label) =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); starJoin().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val plan = starJoin().queryExecution.executedPlan.toString
      val strat = if (plan.contains("BroadcastHashJoin")) "BHJ"
        else if (plan.contains("SortMergeJoin")) "SMJ"
        else if (plan.contains("ShuffledHashJoin")) "SHJ" else "?"
      f"$label=$t%.3f($strat)"
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    println(s"TUNE bsweep ${cells.mkString(" ")}")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "sums") { sumShapes(args(1)); return }
    if (args.nonEmpty && args(0) == "q12parts") { q12Parts(args(1)); return }
    if (args.nonEmpty && args(0) == "spill") { spillAudit(args(1)); return }
    if (args.nonEmpty && args(0) == "bsweep") { broadcastSweep(args(1)); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "q19_dup_groups,q12_rank_parts,q6_ship_delay,q10_distinct_customers")
      .split(",").toSeq
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map(),
      "noGroupLimit" -> Map("spark.sql.optimizer.windowGroupLimitThreshold" -> "-1"),
      "noAQE" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "noAQEnoGL" -> Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.optimizer.windowGroupLimitThreshold" -> "-1"),
      "localRelationThreshold" -> Map(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64m")
    )
    for ((vname, conf) <- variants) {
      val b = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val times = names.map { n =>
        val fn = SparkEntry.queries(n)
        fn(spark, sfDir).count() // warm
        val samples = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        f"$n=${samples.min}%.3f"
      }
      println(s"TUNE $vname ${times.mkString(" ")}")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
