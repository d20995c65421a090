package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 scratch diagnostics (deleted before round end). */
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

    val df = SparkEntry.queries("q49b_band_join_exec")(spark, sfDir)
    println("rows=" + df.collect().length) // execute THIS plan so AQE finalizes
    val plan = df.queryExecution.executedPlan
    println(plan.toString.split("\n").take(30).mkString("\n"))
    // is BandJoinExec inside a WholeStageCodegen subtree?
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    def find(p: SparkPlan, inWSCG: Boolean): Unit = p match {
      case w: WholeStageCodegenExec => w.children.foreach(find(_, true))
      case a: AdaptiveSparkPlanExec => find(a.executedPlan, inWSCG)
      case q: QueryStageExec => find(q.plan, false)
      case b: graft.plans.BandJoinExec =>
        println(s"BANDJOIN inWholeStageCodegen=$inWSCG")
        b.children.foreach(find(_, false))
      case other => other.children.foreach(find(_, inWSCG))
    }
    find(plan, false)
    spark.stop()
  }
}
