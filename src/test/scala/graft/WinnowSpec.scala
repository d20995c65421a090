package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.WinnowKeys
import graft.functions.WinnowKeys.winnow_keys

/** Pins [[graft.functions.WinnowKeys]] — the native rolling-hash winnowing
  * fingerprint — against (a) a composed Spark-SQL form of the identical
  * closed-form math (the shape the DuckDB oracle uses), (b) the MOSS
  * guarantee (≥ W+k−1 shared consecutive tokens ⇒ ≥ 1 shared fingerprint
  * hash), and (c) the edge/adversarial inputs the other native expressions
  * are held to (empty, sub-gram, curly-quote/CJK, capacity guard). */
class WinnowSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def registered = {
    WinnowKeys.register(spark)
    spark
  }

  /** The oracle-side computation re-expressed with Spark built-ins:
    * closed-form Horner gram hash over md5-slice token hashes, 4-row
    * window MIN, truncated-window rule, distinct (hash,pos) keys. */
  private val composedKeys =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
         array_sort(array_distinct(transform(
           filter(
             transform(sequence(4, greatest(size(split(text, ' ')) - 2, 4)),
               j -> array_min(transform(
                 sequence(greatest(j - 3, 1), least(j, size(split(text, ' ')) - 2)),
                 i -> (((((CAST(conv(substring(md5(element_at(split(text, ' '), i)), 1, 10), 16, 10) AS BIGINT) % 2147483647) * 1000003
                     + CAST(conv(substring(md5(element_at(split(text, ' '), i + 1)), 1, 10), 16, 10) AS BIGINT) % 2147483647) % 2147483647) * 1000003
                     + CAST(conv(substring(md5(element_at(split(text, ' '), i + 2)), 1, 10), 16, 10) AS BIGINT) % 2147483647) % 2147483647) * 1048576
                     + (1048575 - (i - 1))))),
             k -> k IS NOT NULL),
           k -> CAST(k AS BIGINT))))
       ELSE array() END"""

  test("native winnow_keys equals the composed closed-form winnow as a set, real corpus") {
    val s = registered
    val bad = Tables.documents(s, sf)
      .select(winnow_keys(col("text")).as("native"), expr(composedKeys).as("ref"))
      .filter(expr("array_sort(native) != ref"))
      .count()
    assert(bad == 0)
    // non-trivial: the corpus yields fingerprints
    val n = Tables.documents(s, sf)
      .select(explode(winnow_keys(col("text"))).as("k")).count()
    assert(n > 0)
  }

  test("winnow guarantee: >= W+k-1 shared consecutive tokens => shared fingerprint hash") {
    val s = registered
    import s.implicits._
    // 200 random-ish pairs built deterministically: both docs embed the same
    // 6-token run at different offsets inside otherwise-disjoint filler
    val pairs = (1 to 200).map { i =>
      val run = (0 until 6).map(t => s"run${i}_$t").mkString(" ")
      val a = ((0 until i % 7).map(j => s"al${i}_$j") :+ run).mkString(" ") +
        " " + (0 until 3).map(j => s"ar${i}_$j").mkString(" ")
      val b = ((0 until (i * 3) % 11).map(j => s"bl${i}_$j") :+ run).mkString(" ") +
        " " + (0 until (i % 5) + 1).map(j => s"br${i}_$j").mkString(" ")
      (i.toLong, a, b)
    }
    val df = pairs.toDF("id", "a", "b")
    val violations = df.select(col("id"),
        expr("transform(winnow_keys(a), k -> k div 1048576)").as("fa"),
        expr("transform(winnow_keys(b), k -> k div 1048576)").as("fb"))
      .filter(expr("size(array_intersect(fa, fb)) = 0"))
      .count()
    assert(violations == 0)
  }

  test("edge inputs: empty, sub-gram, exactly-one-gram, truncated window, non-ASCII") {
    val s = registered
    import s.implicits._
    val rows = Seq(
      "",                         // one empty token, no gram
      "one",                      // 1 token
      "one two",                  // 2 tokens, no gram
      "a b c",                    // 1 gram -> exactly 1 fingerprint
      "a b c d",                  // 2 grams (n < W) -> 1 truncated-window min
      "a b c d e f",              // 4 grams -> exactly one full window
      "“quoted” töken 你好 emoji😀 end x" // curly quotes, umlaut, CJK, emoji
    ).toDF("text")
    val got = rows.select(size(winnow_keys(col("text"))).as("n")).as[Int].collect()
    assert(got(0) == 0 && got(1) == 0 && got(2) == 0)
    assert(got(3) == 1 && got(4) == 1)
    assert(got(5) >= 1 && got(5) <= 2) // windows at j=3 (plus none beyond)
    assert(got(6) >= 1)                // multi-byte tokens hash fine
    // parity with the composed form on the same edge rows (set equality)
    val bad = rows.select(winnow_keys(col("text")).as("native"),
        expr(composedKeys).as("ref"))
      .filter(expr("array_sort(native) != ref")).count()
    assert(bad == 0)
  }

  test("selection order is first-selection order; keys decode to (hash, rightmost pos)") {
    val s = registered
    import s.implicits._
    // repeated token run: equal hashes at many positions — the canonical
    // tie rule must pick the RIGHTMOST position among equal window minima
    val txt = (1 to 12).map(_ => "rep").mkString(" ") // 10 identical grams
    val keys = Seq(txt).toDF("text")
      .select(winnow_keys(col("text")).as("k"))
      .select(explode(col("k")).as("key")).as[Long].collect()
    // all 10 grams share one hash, so the rightmost tie rule makes every
    // window's minimum its RIGHTMOST gram: selections are grams 3..9
    // (0-based), emitted in first-selection order
    val poss = keys.map(k => 1048575L - (k & 1048575L))
    assert(keys.map(_ >> 20).distinct.length == 1)  // single hash
    assert(poss.toSeq == (3L to 9L))                // rightmost per window, left-to-right
  }

  test("capacity guard: documents beyond 2^20 grams raise a named error") {
    val s = registered
    import s.implicits._
    val big = (0 to (1 << 20) + 2).map(i => s"t$i").mkString(" ")
    val e = intercept[Exception] {
      Seq(big).toDF("text").select(winnow_keys(col("text"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("winnow_keys")))
  }

  test("q39 query is deterministic and matches its own recomputation") {
    val s = registered
    val q = graft.operators.TextOps.q39_winnow_fingerprints
    val a = q(s, sf).collect()
    val b = q(s, sf).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    // (doc_id, fp_pos) is unique: one key per selected gram
    val df = q(s, sf)
    assert(df.count() == df.select("doc_id", "fp_pos").distinct().count())
  }

  test("q63 pair report equals a composed recomputation (no packing, no bounded agg)") {
    val s = registered
    import s.implicits._
    val cap = graft.operators.TextOps.WinnowDfCap
    val fp = Tables.documents(s, sf)
      .select(col("doc_id"), explode(array_distinct(transform(
        winnow_keys(col("text")),
        k => shiftright(k, WinnowKeys.PosBits)))).as("fp_hash"))
    val fpc = fp.join(
      fp.groupBy("fp_hash").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("fp_hash"),
      "fp_hash")
    val sizes = fpc.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val ref = fpc.as("a")
      .join(fpc.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("d1"), col("n_fp").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n_fp").as("n2")), Seq("d2"))
      .withColumn("containment",
        col("n_shared").cast("double") / least(col("n1"), col("n2")).cast("double"))
      .filter(col("n_shared") >= 2 && col("containment") >= 0.5)
      .select("d1", "d2", "n_shared", "containment")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = graft.operators.TextOps.q63_winnow_dup_pairs(s, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty, "corpus yields no winnow dup pairs — fixture too weak")
    assert(got.forall { case (d1, d2, n, c) => d1 < d2 && n >= 2 && c >= 0.5 })
  }

  test("q63 containment catches embedding and exact duplication, skips disjoint docs") {
    val s = registered
    import s.implicits._
    // doc 1 is embedded verbatim inside doc 2; doc 4 is doc 2 exactly;
    // doc 3 is disjoint vocabulary. Containment (not Jaccard) is what
    // scores the short-inside-long case near 1.0.
    val inner = (0 until 12).map(i => s"core$i").mkString(" ")
    val pre   = (0 until 25).map(i => s"pre$i").mkString(" ")
    val post  = (0 until 25).map(i => s"post$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("q63docs").toString
    Seq(
      (1L, inner),
      (2L, s"$pre $inner $post"),
      (3L, (0 until 40).map(i => s"other$i").mkString(" ")),
      (4L, s"$pre $inner $post")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.q63_winnow_dup_pairs(s, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (d1, d2, n, c) => (d1, d2) -> ((n, c)) }.toMap
    assert(got.contains((1L, 2L)), "embedded doc not detected")
    assert(got((1L, 2L))._2 >= 0.5)
    assert(got((2L, 4L))._2 == 1.0, "exact duplicate must have containment 1.0")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)) && !got.contains((3L, 4L)))
  }
}
