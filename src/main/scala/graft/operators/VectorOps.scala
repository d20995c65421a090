package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.Tables._
import graft.functions.DotProduct.{dot_product, register}

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * All dot products run as sequential left folds over double-cast elements
  * (`aggregate`/`zip_with` in Spark, `list_reduce` in DuckDB) — identical
  * accumulation order ⇒ bit-identical doubles, so even raw cosine values
  * hash-match the oracle.
  *
  * Scale story: brute-force top-k is the O(Q·N) baseline with a bounded
  * query set; the sign-LSH variant buckets vectors by a random-hyperplane-
  * style bit code so the candidate join is bucket-local — the 100 TB path.
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  /** Elementwise-double copy of the embedding. */
  private val VECD = "transform(embedding, x -> CAST(x AS DOUBLE))"

  private def dotSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  // --------------------------------------------------- brute-force top-k
  /** Exact cosine top-3 neighbors for a fixed probe set (vec_id < 20):
    * broadcast the probes, scan candidates once, rank per probe. */
  val q40_cosine_topk: Q = (s, d) => {
    register(s)
    val vecs = embeddings(s, d)
      .select(col("vec_id"), expr(VECD).as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    val probes = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val scored = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        dot_product(col("qv"), col("v")) / (col("qn") * col("norm")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id")))
        .cast(IntegerType))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  // --------------------------------------------------- sign-LSH buckets
  /** Sign-bit code over the first 8 dimensions (random-hyperplane LSH with
    * axis-aligned planes — embeddings are already whitened/normalized).
    * Bucket histogram: the partition layout an IVF/LSH ANN index would use. */
  val q41_lsh_buckets: Q = (s, d) =>
    embeddings(s, d)
      .withColumn("bucket", expr(
        """aggregate(sequence(0, 7),
             0, (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > CAST(0 AS FLOAT)
                                       THEN CAST(shiftleft(1, i) AS INT) ELSE 0 END)"""))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"),
           countDistinct(col("label")).as("n_labels"))
      .orderBy("bucket")

  /** LSH-bucketed near-neighbor pairs: candidates share an 8-bit sign
    * bucket (the join is bucket-local, never all-pairs), verified by exact
    * cosine ≥ 0.2. */
  val q42_lsh_neardup: Q = (s, d) => {
    register(s)
    val vecs = embeddings(s, d)
      .select(col("vec_id"), expr(VECD).as("v"),
              expr(
                """aggregate(sequence(0, 7),
                     0, (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > CAST(0 AS FLOAT)
                                               THEN CAST(shiftleft(1, i) AS INT) ELSE 0 END)""")
                .as("bucket"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    val a = vecs.select(col("bucket"), col("vec_id").as("d1"), col("v").as("v1"), col("norm").as("n1"))
    val b = vecs.select(col("bucket"), col("vec_id").as("d2"), col("v").as("v2"), col("norm").as("n2"))
    a.join(b, Seq("bucket")).filter(col("d1") < col("d2"))
      .withColumn("cosine", dot_product(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cosine") >= 0.2)
      .select("bucket", "d1", "d2", "cosine")
      .orderBy("bucket", "d1", "d2")
  }

  // ------------------------------------------------- kNN label vote
  /** 5-NN majority-vote label accuracy for probes (vec_id < 50): the
    * standard embedding-quality probe. Vote ties break toward the smaller
    * label; per-label accuracy out. */
  val q43_knn_accuracy: Q = (s, d) => {
    register(s)
    val vecs = embeddings(s, d)
      .select(col("vec_id"), col("label"), expr(VECD).as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    val probes = vecs.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
              col("v").as("qv"), col("norm").as("qn"))
    val top5 = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", dot_product(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rnk") <= 5)
    val votes = top5.groupBy("q_id", "q_label", "label")
      .agg(count(lit(1)).as("n_votes"))
    val pred = votes
      .withColumn("vr", row_number().over(
        Window.partitionBy("q_id").orderBy(col("n_votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("q_label"), col("label").as("predicted"))
    pred.groupBy("q_label")
      .agg(count(lit(1)).as("n_probes"),
           sum(when(col("predicted") === col("q_label"), 1).otherwise(0)).as("n_correct"))
      .orderBy("q_label")
  }

  // --------------------------------------------------------- IVF ANN
  /** IVF coarse quantizer: deterministic k-means (init = first K vectors,
    * fixed Lloyd iterations, ties to the smaller centroid id) partitions
    * the corpus into K cells; a query probes only its nprobe nearest
    * cells. This is the 100 TB ANN layout: the cell assignment is the
    * partition key, so a query touches K_probe/K of the data. No DuckDB
    * oracle (iterative k-means is not reasonably SQL-expressible) —
    * rows-only check; VectorOpsSpec asserts recall against exact top-k. */
  def ivfAssignments(s: SparkSession, d: String, k: Int, iters: Int): (DataFrame, DataFrame) = {
    register(s)
    val vecs = embeddings(s, d).select(col("vec_id"), expr(VECD).as("v"))
    def sqdist = expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    var cent = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cid"), col("v").as("cv"))
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      assign = vecs.crossJoin(broadcast(cent))
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
      // centroids are K×dim doubles — materialize on the driver to cut the
      // otherwise exponentially deepening Lloyd lineage (standard k-means-
      // on-Spark shape; the collected size is bounded by K, not the data)
      import s.implicits._
      cent = broadcast(newCent.as[(Int, Seq[Double])].collect().toSeq
        .toDF("cid", "cv"))
    }
    (cent, assign)
  }

  /** ANN search through the IVF index: nprobe=2 cells per query, exact
    * cosine re-rank inside the probed cells. */
  val q46_ivf_ann: Q = (s, d) => {
    val (cent, assign) = ivfAssignments(s, d, k = 16, iters = 3)
    val probes = embeddings(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), expr(VECD).as("qv"))
      .withColumn("qn", sqrt(dot_product(col("qv"), col("qv"))))
    val probeCells = probes.crossJoin(cent)
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("qv"), col("qn"), col("cid"))
    val cands = assign
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    probeCells.join(cands, Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", dot_product(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id")))
        .cast(IntegerType))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  // ===================================================================
  val queries: Map[String, Q] = Map(
    "q46_ivf_ann"      -> q46_ivf_ann,
    "q40_cosine_topk"  -> q40_cosine_topk,
    "q41_lsh_buckets"  -> q41_lsh_buckets,
    "q42_lsh_neardup"  -> q42_lsh_neardup,
    "q43_knn_accuracy" -> q43_knn_accuracy,
  )

  private val VECD_SQL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (acc, v) -> acc + v)"
  private val BUCKET_SQL =
    """list_reduce(list_transform(generate_series(0, 7),
         i -> CASE WHEN embedding[i + 1] > 0 THEN (1 << i) ELSE 0 END), (acc, v) -> acc + v)"""

  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      s"""WITH vecs AS (
           SELECT vec_id, $VECD_SQL AS v, sqrt(${dotDuck("v0", "v0").replace("v0", VECD_SQL)}) AS norm
           FROM embeddings),
         probes AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM vecs WHERE vec_id < 20),
         scored AS (
           SELECT q_id, vec_id, ${dotDuck("qv", "v")} / (qn * norm) AS cosine
           FROM vecs, probes WHERE vec_id <> q_id),
         ranked AS (
           SELECT q_id, vec_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rnk
           FROM scored)
         SELECT q_id, rnk, vec_id AS neighbor_id, cosine
         FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk""",

    "q41_lsh_buckets" ->
      s"""SELECT $BUCKET_SQL AS bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
         FROM embeddings GROUP BY 1 ORDER BY 1""",

    "q42_lsh_neardup" ->
      s"""WITH vecs AS (
           SELECT vec_id, $VECD_SQL AS v,
             sqrt(${dotDuck("v0", "v0").replace("v0", VECD_SQL)}) AS norm,
             $BUCKET_SQL AS bucket
           FROM embeddings)
         SELECT a.bucket, a.vec_id AS d1, b.vec_id AS d2,
           ${dotDuck("a.v", "b.v")} / (a.norm * b.norm) AS cosine
         FROM vecs a JOIN vecs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         WHERE ${dotDuck("a.v", "b.v")} / (a.norm * b.norm) >= 0.2
         ORDER BY a.bucket, d1, d2""",

    "q43_knn_accuracy" ->
      s"""WITH vecs AS (
           SELECT vec_id, label, $VECD_SQL AS v, sqrt(${dotDuck("v0", "v0").replace("v0", VECD_SQL)}) AS norm
           FROM embeddings),
         probes AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, norm AS qn FROM vecs WHERE vec_id < 50),
         scored AS (
           SELECT q_id, q_label, vec_id, label,
             ${dotDuck("qv", "v")} / (qn * norm) AS cosine
           FROM vecs, probes WHERE vec_id <> q_id),
         top5 AS (
           SELECT * FROM (
             SELECT q_id, q_label, label, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
             FROM scored) WHERE rnk <= 5),
         votes AS (
           SELECT q_id, q_label, label, COUNT(*) AS n_votes
           FROM top5 GROUP BY q_id, q_label, label),
         pred AS (
           SELECT q_id, q_label, label AS predicted FROM (
             SELECT q_id, q_label, label,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS vr
             FROM votes) WHERE vr = 1)
         SELECT q_label, COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN predicted = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         FROM pred GROUP BY q_label ORDER BY q_label""",
  )
}
