package graft

import org.apache.spark.sql.SparkSession

/** Round-7 scratch diagnostics (deleted before round end): sizes
  * broadcast-vs-shuffle A/B for the jaccard pipeline at a given SF. */
object ProbeR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q34 = graft.operators.TextOps.q34_ngram_jaccard
    def runs(label: String): Unit = {
      q34(spark, sfDir).count() // warm
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); q34(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label min=${t.min}%.3f med=${t.sorted.apply(2)}%.3f")
    }
    runs("sizes_broadcast")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    runs("sizes_shuffle  ")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
