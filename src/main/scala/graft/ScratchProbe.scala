package graft
// TEMPORARY probe (deleted before commit): q79 stage decomposition at sf30.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Natives.registerAll(spark)
    import graft.operators.IvfIndex
    import graft.functions.TopKByScore.top_k_by_score
    val idx = IvfIndex.ensure(spark, d)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def membership = spark.read.parquet(s"$idx/assignments")
      .select(col("vec_id"), col("v"))
      .crossJoin(broadcast(IvfIndex.centroids(spark, idx)))
      .withColumn("d2", graft.functions.SqDist.sq_dist(col("v"), col("cv")))
      .groupBy("vec_id")
      .agg(top_k_by_score(2)(-col("d2"), col("cid"), lit(0)).as("top"))
      .select(col("vec_id"), explode(col("top._2")).as("cid"))
    timed("membership-only")(membership.count())
    timed("membership-only-2nd")(membership.count())
    def memFull(i: Int) = spark.read.parquet(s"$idx/assignments")
      .select(col("vec_id"), col("v"), col("norm"))
      .join(membership, Seq("vec_id"))
      .select(col("vec_id").as(s"d$i"), col("v").as(s"v$i"),
              col("norm").as(s"n$i"), col("cid").as(s"cid$i"))
    timed("pair-join+dedup") {
      memFull(1).join(memFull(2), col("cid1") === col("cid2") && col("d1") < col("d2"))
        .withColumn("cos", graft.functions.DotProduct.dot_product(col("v1"), col("v2")) / (col("n1") * col("n2")))
        .filter(col("cos") >= 0.2)
        .groupBy(col("d2")).agg(min(struct(col("d1"), col("cos"))).as("m"))
        .count()
    }
    spark.stop()
  }
}
