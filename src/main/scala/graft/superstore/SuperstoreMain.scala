package graft.superstore

import org.apache.spark.sql.SparkSession

/** Warehouse CLI (the reference's `python etl.py` + notebook analog):
  * build the 15-table star schema from the CSV, persist as parquet, run
  * the 13-query workload.
  * Usage: runMain graft.superstore.SuperstoreMain <csvPath> <outDir> [query...]
  */
object SuperstoreMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SuperstoreMain <csvPath> <outDir> [queryName...]")
    val Array(csvPath, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") // sorted single-file buckets serve their scan order (Spark self-guards multi-file buckets; BucketedLayoutSpec pins sort-free SMJ + the guard)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = SuperstoreETL.build(spark, csvPath)
    wh.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"WAREHOUSE $name rows=${spark.read.parquet(s"$outDir/$name").count()}")
    }

    Queries13.registerViews(wh)
    val toRun = if (args.length > 2) args.drop(2).toSeq else Queries13.queries.keys.toSeq.sorted
    toRun.foreach { name =>
      val df = Queries13.queries(name)(wh)
      println(s"QUERY $name rows=${df.count()}")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
