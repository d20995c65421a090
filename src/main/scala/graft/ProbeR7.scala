package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 scratch diagnostics (deleted before round end): interleaved
  * A/B of the round-6 vs round-7 q6/q28 forms in one session. */
object ProbeR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import Tables._

    val q6_old: DataFrame = {
      val cal = Tables.calendar(spark, sfDir)
      val oc = broadcast(cal).as("oc")
      val sc = broadcast(cal).as("sc")
      lineitem(spark, sfDir)
        .join(orders(spark, sfDir).hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(oc, col("o_orderdate").cast(DateType) === col("oc.full_date"))
        .join(sc, col("l_shipdate").cast(DateType) === col("sc.full_date"))
        .groupBy("o_orderpriority")
        .agg(
          (sum(datediff(col("sc.full_date"), col("oc.full_date"))).cast(DoubleType) /
            count(lit(1))).as("avg_delay_days"),
          min(datediff(col("sc.full_date"), col("oc.full_date"))).as("min_delay"),
          max(datediff(col("sc.full_date"), col("oc.full_date"))).as("max_delay"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }
    val q28_old: DataFrame =
      lineitem(spark, sfDir)
        .join(orders(spark, sfDir).hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
          floor(sum(datediff(col("l_shipdate").cast(DateType),
                             col("o_orderdate").cast(DateType))).cast(DoubleType) /
                count(lit(1)) + 0.5).cast(IntegerType).as("avg_delay"),
          count(lit(1)).as("method_freq"))
        .orderBy("o_orderpriority", "l_returnflag")

    val q6_new = graft.operators.Relational.q6_ship_delay(spark, sfDir)
    val q28_new = graft.operators.Warehouse.q28_shipping_behavior(spark, sfDir)

    val variants = Seq(
      "q6_old" -> q6_old, "q6_new" -> q6_new,
      "q28_old" -> q28_old, "q28_new" -> q28_new)
    variants.foreach(_._2.count()) // warm
    val t = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    (1 to 7).foreach { _ =>
      variants.foreach { case (n, df) =>
        val t0 = System.nanoTime(); df.count()
        t(n) = t(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      println(f"$n%-8s min=${t(n).min}%.3f med=${t(n).sorted.apply(3)}%.3f")
    }
    spark.stop()
  }
}
