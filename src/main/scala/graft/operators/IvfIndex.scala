package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.Tables._
import graft.functions.DotProduct.register

/** IVF (inverted-file) ANN index over the embeddings table, split the way a
  * 100 TB deployment must be: an INDEX-BUILD job that trains the coarse
  * quantizer and persists it, and a SEARCH path that only reads the index
  * (see VectorOps.q46_ivf_ann).
  *
  * Build: deterministic k-means (init = first K vectors, fixed Lloyd
  * iterations, ties to the smaller centroid id), then one final assignment
  * pass against the FINAL centroids, persisted as
  *   - `centroids.parquet`  — (cid INT, cv ARRAY<DOUBLE>), K rows
  *   - `assignments/`       — (vec_id, v, norm) partitioned by cid: the
  *     cell-partitioned layout, so a search reading nprobe cells touches
  *     only nprobe/K of the corpus (partition pruning on cid)
  *
  * The per-iteration centroid collect is the standard k-means-on-Spark
  * lineage cut — K×dim doubles, bounded by K, never by data size — and it
  * runs at BUILD time only; queries never train.
  *
  * Persisted centroids are the oracle boundary: the search (assignment of
  * every vector to its nearest persisted centroid + nprobe probe cells +
  * exact cosine re-rank) is plain SQL over the centroids table, so DuckDB
  * can replay it bit-for-bit — q46 is hash-checked, not rows-only.
  */
object IvfIndex {

  val K = 16
  val Iters = 3
  val NProbe = 2

  /** Index location derived from the build inputs (sfDir, K, Iters): each
    * configuration owns its directory, so a run for one sf can never
    * silently swap the centroids out from under another sf's oracle
    * replay (the round-2 fixed `current/` path rebuilt in place on
    * mismatch — racy across JVMs and across a Verify run vs the driver's
    * later DuckDB read). The oracle SQL carries an `__IVF__` placeholder
    * that Verify resolves via this same function at dump time. */
  def indexDir(sfDir: String, k: Int = K, iters: Int = Iters): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$k|$iters".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"/root/repo/target/ivf_index/$h"
  }

  private val VECD = "transform(embedding, x -> CAST(x AS DOUBLE))"
  private def sqdist = expr(
    "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")

  /** Train + persist the index for `sfDir` into `indexDir`. */
  def build(s: SparkSession, sfDir: String, indexDir: String,
            k: Int = K, iters: Int = Iters): Unit = {
    register(s)
    import s.implicits._
    val vecs = embeddings(s, sfDir).select(col("vec_id"), expr(VECD).as("v"))
    var cent = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assign = vecs.crossJoin(broadcast(cent))
        .withColumn("d2", sqdist)
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cid"))
      val newCent = assign
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(named_struct('p', pos, 'm', m))), s -> s.m)").as("cv"))
      // K×dim doubles — the bounded lineage cut (see scaladoc)
      cent = broadcast(newCent.as[(Int, Seq[Double])].collect().toSeq.toDF("cid", "cv"))
    }
    // final assignment against the FINAL centroids — what search + oracle
    // see; norm is per-row constant, so precompute it into the index
    val finalAssign = vecs.crossJoin(broadcast(cent))
      .withColumn("d2", sqdist)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"),
              sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))).as("norm"),
              col("cid"))
    cent.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids.parquet")
    finalAssign.write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/assignments")
    // _meta.json is the build-complete marker, written LAST via atomic
    // rename: a concurrent reader either sees a complete index or none.
    val tmp = Paths.get(s"$indexDir/_meta.json.tmp")
    Files.writeString(tmp, s"""{"sfDir":"$sfDir","k":$k,"iters":$iters}""")
    Files.move(tmp, Paths.get(s"$indexDir/_meta.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Ensure an index built from `sfDir` exists at its derived location;
    * build only when the completion marker is absent (per-config dirs
    * never need the rebuild-on-mismatch dance). */
  def ensure(s: SparkSession, sfDir: String): String = synchronized {
    val dir = indexDir(sfDir)
    val meta = Paths.get(s"$dir/_meta.json")
    val want = s"""{"sfDir":"$sfDir","k":$K,"iters":$Iters}"""
    if (!Files.exists(meta) || Files.readString(meta) != want)
      build(s, sfDir, dir, K, Iters)
    dir
  }

  def centroids(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/centroids.parquet")

  def assignments(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/assignments")

  /** Index-build CLI: `runMain graft.operators.IvfIndex <sfDir> [indexDir]`. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else indexDir(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts is TIMESTAMP(NANOS)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    build(s, sfDir, outDir)
    println(s"IVF_INDEX_BUILT $outDir k=$K iters=$Iters")
    s.stop()
  }
}
