package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Md5Long.md5_long
import graft.functions.WordShingles.word_shingles

/** Round-7 native expressions pinned bit-equal to the composed built-in
  * forms they replaced (the forms the DuckDB oracles still use). */
class NativeExprSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def registered = {
    graft.functions.Natives.registerAll(spark)
    spark
  }

  test("md5_long equals conv(substring(md5(x))) on real corpus keys") {
    val s = registered
    // edge inputs: empty string, multi-byte UTF-8, plus real doc ids/text
    import s.implicits._
    val edge = Seq("", "a", "≠ utf-8 ≠", "exact:42", "0").toDF("k")
    val docs = Tables.documents(s, sf).select(col("text").as("k")).limit(200)
      .union(edge)
    val slices = Seq((0, 2), (0, 12), (12, 12), (0, 15), (17, 15), (31, 1))
    slices.foreach { case (start, n) =>
      val bad = docs.select(
          md5_long(col("k"), start, n).as("native"),
          expr(s"CAST(conv(substring(md5(k), ${start + 1}, $n), 16, 10) AS BIGINT)")
            .as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(bad.count() == 0, s"md5_long slice ($start, $n) diverges")
    }
  }

  test("sq_dist is BIT-identical to the aggregate/zip_with fold; ragged → NULL") {
    graft.functions.Natives.registerAll(spark)
    // real corpus vectors, all pairs of a 40-vector slice (1.6k pairs of
    // 64-dim doubles), plus constructed edge rows
    val v = Tables.embeddings(spark, sf).filter(col("vec_id") < 40)
      .select(col("vec_id").as("ia"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val w = Tables.embeddings(spark, sf).filter(col("vec_id") < 40)
      .select(col("vec_id").as("ib"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("b"))
    val bad = v.crossJoin(w)
      .select(
        graft.functions.SqDist.sq_dist(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("composed"))
      // BIT comparison, not ==: NaN-safe and ulp-strict
      .filter(expr("CAST(native AS STRING) IS DISTINCT FROM CAST(composed AS STRING)") ||
        expr("isnan(native) <> isnan(composed)"))
    assert(bad.count() == 0)
    // ragged lengths: NULL, same as the null-padding zip_with sum
    import spark.implicits._
    val ragged = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(graft.functions.SqDist.sq_dist(col("a"), col("b")).as("d"))
    assert(ragged.head().isNullAt(0))
  }

  test("md5_long first-byte compare matches hex-substring compare") {
    val s = registered
    val d = Tables.lineitem(s, sf)
      .select(concat(col("l_orderkey").cast("string"), lit(":"),
                     col("l_linenumber").cast("string")).as("k"))
    val nNative = d.filter(md5_long(col("k"), 0, 2) < 26).count()
    val nHex = d.filter(expr("substring(md5(k), 1, 2) < '1a'")).count()
    assert(nNative == nHex)
    assert(nNative > 0) // the sample is non-trivial
  }

  test("word_shingles equals the transform/array_distinct composition as a set") {
    val s = registered
    val composed =
      """CASE WHEN size(split(text, ' ')) >= 3
           THEN array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
                  i -> concat_ws(' ', element_at(split(text, ' '), i),
                                      element_at(split(text, ' '), i + 1),
                                      element_at(split(text, ' '), i + 2))))
           ELSE array() END"""
    val bad = Tables.documents(s, sf)
      .select(word_shingles(col("text")).as("native"), expr(composed).as("ref"))
      .filter(expr("array_sort(native) != array_sort(ref)"))
    assert(bad.count() == 0)
  }

  test("word_shingles edge cases: short, empty, and empty-token texts") {
    val s = registered
    import s.implicits._
    // "a  b c" splits to ["a","","b","c"] — empty tokens participate,
    // exactly like split(text, ' ') and DuckDB string_split
    val rows = Seq("", "one", "one two", "a b c", "a  b c", "x x x x")
      .toDF("text")
      .select(col("text"), word_shingles(col("text")).as("sh"),
              expr("""CASE WHEN size(split(text, ' ')) >= 3
                THEN array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
                       i -> concat_ws(' ', element_at(split(text, ' '), i),
                                           element_at(split(text, ' '), i + 1),
                                           element_at(split(text, ' '), i + 2))))
                ELSE array() END""").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).sorted == r.getSeq[String](2).sorted,
        s"mismatch for '${r.getString(0)}'")
    }
  }

  // ------------------- round-8 adversarial inputs (VERDICT r7 item 3) ----

  test("word_shingles on non-ASCII and win-1252 curly-quote text") {
    val s = registered
    import s.implicits._
    // the superstore CSV's win-1252 heritage: curly quotes U+2018/19/1C/1D,
    // NBSP, accented latin, CJK (multi-byte UTF-8), and an astral emoji —
    // shingling must treat them as opaque token bytes exactly like the
    // composed split/concat form (and DuckDB's string_split)
    val texts = Seq(
      "“quoted” words ‘here’ again",
      "café naïve résumé über alles",
      "中文 分词 测试 样本",
      "mixed  nbsp token stream",
      "emoji 😀 in 😀 text 😀 tokens",
      "don’t — em–dash … ellipsis here")
    val rows = texts.toDF("text")
      .select(col("text"), word_shingles(col("text")).as("sh"),
              expr("""CASE WHEN size(split(text, ' ')) >= 3
                THEN array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
                       i -> concat_ws(' ', element_at(split(text, ' '), i),
                                           element_at(split(text, ' '), i + 1),
                                           element_at(split(text, ' '), i + 2))))
                ELSE array() END""").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).sorted == r.getSeq[String](2).sorted,
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("md5_long boundary slices (nibble 0, 15, 16, 31) and n=16 rejection") {
    val s = registered
    import s.implicits._
    val docs = Seq("", "a", "boundary probe", "“win-1252”").toDF("k")
    // single-nibble reads across both halves of a digest byte + both ends
    Seq((0, 1), (15, 1), (16, 1), (31, 1), (17, 15)).foreach { case (st, n) =>
      val bad = docs.select(
          md5_long(col("k"), st, n).as("native"),
          expr(s"CAST(conv(substring(md5(k), ${st + 1}, $n), 16, 10) AS BIGINT)")
            .as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(bad.count() == 0, s"slice ($st, $n) diverges")
    }
    // 16 nibbles = 64 bits — would overflow a signed long: rejected at
    // analysis, never silently wrapped
    val e = intercept[Exception] {
      docs.select(md5_long(col("k"), 0, 16)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow")
      || e.getMessage.contains("16"), s"unexpected rejection: ${e.getMessage}")
  }

  test("sorted_pairs and sorted_pair_keys: cap boundary, duplicates, packing range") {
    val s = registered
    graft.functions.Natives.registerAll(s)
    import s.implicits._
    import graft.functions.SortedPairs.{sorted_pairs, sorted_pair_keys}
    def naive(a: Seq[Long]): Seq[(Long, Long)] =
      for (i <- a.indices; j <- i + 1 until a.size) yield (a(i), a(j))
    // cap-boundary size (cap+1 = 51 ids → C(51,2) = 1275 pairs), duplicate
    // ids (producer never emits them, but the expression must stay a pure
    // i<j enumeration), and uint32 extremes for the packed form
    val cases: Seq[Seq[Long]] = Seq(
      (1L to 51L),
      Seq(1L, 1L, 2L),
      Seq(0L, 1L, (1L << 32) - 1),
      // d1 ≥ 2^31 sets bit 63 of the packed key — the case where an
      // arithmetic shiftright would sign-extend d1 negative (caught a
      // real unpack bug in round 8; shiftrightunsigned is the contract)
      Seq(1L << 31, (1L << 31) + 7, (1L << 32) - 1),
      Seq.empty[Long], Seq(7L))
    cases.foreach { c =>
      val df = Seq(Tuple1(c)).toDF("a")
      val structPairs = df.select(explode(sorted_pairs(col("a"))).as("p"))
        .select(col("p.d1"), col("p.d2")).as[(Long, Long)].collect().toSeq
      val packed = df.select(explode(sorted_pair_keys(col("a"))).as("pk"))
        .select(shiftrightunsigned(col("pk"), 32), col("pk").bitwiseAND(lit((1L << 32) - 1)))
        .as[(Long, Long)].collect().toSeq
      assert(structPairs == naive(c), s"sorted_pairs diverges on $c")
      assert(packed == naive(c), s"sorted_pair_keys diverges on $c")
    }
    // out-of-range id: raises, never silently mis-packs
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1L, 1L << 32))).toDF("a")
        .select(explode(sorted_pair_keys(col("a")))).collect()
    }
    assert(e.getMessage.contains("2^32") || e.getCause != null)
  }

  test("sorted_pair_keys == sorted_pairs on 200 random uint32 arrays (property)") {
    import org.scalacheck.{Gen => G}
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val genArr = for {
      n <- G.choose(0, 60)
      vs <- G.listOfN(n, G.choose(0L, (1L << 32) - 1))
    } yield vs.distinct.sorted
    (1 to 200).foreach { i =>
      val a = genArr(G.Parameters.default, Seed(i.toLong)).get
      val structs = graft.functions.SortedPairs.pairs(new GenericArrayData(a.toArray))
      val packed = graft.functions.SortedPairs.packedPairs(new GenericArrayData(a.toArray))
      val n = a.size
      assert(structs.numElements() == n * (n - 1) / 2 &&
             packed.numElements() == n * (n - 1) / 2, s"seed $i count")
      (0 until packed.numElements()).foreach { j =>
        val row = structs.getStruct(j, 2)
        val pk = packed.getLong(j)
        assert(row.getLong(0) == (pk >>> 32) && row.getLong(1) == (pk & 0xffffffffL),
          s"seed $i pair $j diverges")
      }
    }
  }

  test("bounded_doc_set is invariant to partitioning, order, and sort fallback") {
    val s = registered
    graft.functions.Natives.registerAll(s)
    import s.implicits._
    val cap = 5
    // 3 shingles: under-cap, exactly-cap, over-cap (df=40 > cap+1=6)
    val rows = (1L to 3L).flatMap { g =>
      val df = g match { case 1 => 3; case 2 => 5; case _ => 40 }
      (1 to df).map(i => (s"sh$g", (1000 * g + 7919L * i) % 997))
    }
    def runWith(partitions: Int, desc: Boolean, forceFallback: Boolean): Map[String, (Long, Seq[Long])] = {
      val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      if (forceFallback) s.conf.set(key, "1")
      try {
        val base = rows.toDF("sh", "doc")
        val arranged = if (desc) base.orderBy(col("doc").desc) else base
        arranged.repartition(partitions, col("doc"))
          .groupBy("sh")
          .agg(graft.functions.BoundedDocSetAgg.bounded_doc_set(cap)(col("doc")).as("g"))
          .select(col("sh"), col("g.n"), col("g.docs"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2).toSeq))
          .toMap
      } finally if (forceFallback) s.conf.unset(key)
    }
    val ref = runWith(1, desc = false, forceFallback = false)
    // contract: exact n; smallest cap+1 ids ascending — for ANY delivery
    ref.foreach { case (sh, (n, docs)) =>
      val all = rows.filter(_._1 == sh).map(_._2).sorted
      assert(n == all.size, s"$sh count")
      assert(docs == all.take(cap + 1), s"$sh kept prefix")
    }
    Seq(runWith(7, desc = true, forceFallback = false),
        runWith(13, desc = false, forceFallback = true),
        runWith(3, desc = true, forceFallback = true)).foreach { v =>
      assert(v == ref, "bounded_doc_set result depends on delivery order/path")
    }
  }

  test("gram_stats equals the explode/groupBy composition on the real corpus") {
    val s = registered
    graft.functions.Natives.registerAll(s)
    // composed reference: per-doc total/distinct/max from the exploded
    // gram table — the pipeline form q59 used before going row-local
    def composed(n: Int) = {
      val parts = (1 to n).map(k => s"element_at(t, i + ${k - 1})").mkString(", ")
      Tables.documents(s, sf)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(expr(
          s"CASE WHEN size(t) >= $n THEN transform(sequence(1, size(t) - ${n - 1}), " +
            s"i -> concat_ws(' ', $parts)) ELSE array() END")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
             max(col("c")).as("max_count"))
    }
    Seq(1, 2, 3).foreach { n =>
      val ref = composed(n).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val got = Tables.documents(s, sf)
        .select(col("doc_id"), expr(s"gram_stats(text, $n)").as("st"))
        .select(col("doc_id"), col("st.n_grams"), col("st.n_distinct"), col("st.max_count"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .filter(_._2._1 > 0).toMap
      assert(got == ref, s"gram_stats($n) diverges from the composed form")
    }
  }

  test("gram_stats edge cases: empty, sub-gram, uniform repeats, non-ASCII") {
    val s = registered
    graft.functions.Natives.registerAll(s)
    import s.implicits._
    def st(text: String, n: Int): (Long, Long, Long) = {
      val r = Seq(text).toDF("text")
        .select(expr(s"gram_stats(text, $n)").as("s"))
        .select("s.n_grams", "s.n_distinct", "s.max_count").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // empty string splits to [""] — one token, no 2-gram
    assert(st("", 2) == ((0L, 0L, 0L)))
    assert(st("solo", 2) == ((0L, 0L, 0L)))
    assert(st("a b", 3) == ((0L, 0L, 0L)))
    // "x x x x": three 2-grams, all identical
    assert(st("x x x x", 2) == ((3L, 1L, 3L)))
    // all distinct
    assert(st("a b c d", 2) == ((3L, 3L, 1L)))
    // 1-grams are token counts
    assert(st("a b a", 1) == ((3L, 2L, 2L)))
    // double space makes an empty token — preserved, like split(' ')
    assert(st("a  b", 2) == ((2L, 2L, 1L)))
    // non-ASCII round-trips through the UTF8String boundary
    assert(st("“quoted” café “quoted” café", 2) == ((3L, 2L, 2L)))
    assert(st("你好 世界 你好 世界", 2) == ((3L, 2L, 2L)))
  }

  test("dense_bitmap: membership exact, partition-invariant, bounds raise") {
    val s = registered
    graft.functions.Natives.registerAll(s)
    import s.implicits._
    val nBits = 1L << 10
    val positions = Seq(0L, 1L, 63L, 64L, 65L, 511L, 512L, 1023L, 63L, 0L)
    def bitmap(parts: Int): Array[Long] = {
      val arr = positions.toDF("pos").repartition(parts)
        .agg(expr(s"dense_bitmap(pos, ${nBits}L)")).head
        .getSeq[Long](0).toArray
      arr
    }
    val b1 = bitmap(1)
    // word count = nBits/64; exactly the inserted bits are set (duplicates
    // idempotent), everything else clear
    assert(b1.length == (nBits / 64).toInt)
    val want = positions.toSet
    (0L until nBits).foreach { p =>
      val set = ((b1((p >> 6).toInt) >>> (p & 63)) & 1L) == 1L
      assert(set == want.contains(p), s"bit $p")
    }
    // merge-order / partitioning invariance: OR is commutative by
    // construction, but the aggregate path (partials + exchange) must
    // reproduce the single-partition result bit for bit
    assert(bitmap(7).sameElements(b1))
    // out-of-range position raises (never wraps: a wrapped bit corrupts
    // membership silently)
    val err = intercept[Exception] {
      Seq(nBits).toDF("pos").agg(expr(s"dense_bitmap(pos, ${nBits}L)")).head
    }
    assert(err.getMessage != null)
  }

  test("sign_code equals the aggregate/CASE composition at every offset/width; column widths too") {
    val s = registered
    import graft.functions.SignCode.sign_code
    import graft.operators.LshGate
    val emb = Tables.embeddings(s, sf).select("vec_id", "embedding")
    // fixed (offset, width) pairs covering the operators' uses: q42 base
    // (0, bits), suffix extensions (64−e, e), band codes (16j, bb), band
    // extensions (next window, e)
    val cases = Seq((0, 8), (0, 15), (0, 24), (48, 16), (16, 16), (40, 24),
                    (56, 8), (63, 1))
    cases.foreach { case (off, w) =>
      val composed =
        if (off == 0) LshGate.sparkBucketExpr(w)
        else LshGate.sparkBandBucketExpr(off, w)
      val bad = emb.select(
          sign_code(col("embedding"), lit(off), lit(w)).as("native"),
          expr(composed).cast("long").as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(bad.count() == 0, s"sign_code ($off, $w) diverges from the composed form")
    }
    // per-ROW width column (the overflow split's shape): suffix code at
    // width e = (vec_id % 12) + 1, native vs the CASE/aggregate text
    val withE = emb.withColumn("e", (col("vec_id") % 12 + 1).cast("int"))
    val bad = withE.select(
        sign_code(col("embedding"), lit(64) - col("e"), col("e")).as("native"),
        expr(LshGate.sparkExtCodeExpr("e")).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(bad.count() == 0, "sign_code with a column width diverges from sparkExtCodeExpr")
    // e = 0 → code 0 via the operators' when(ext<=0) guard semantics
    val z = emb.limit(5).select(
      org.apache.spark.sql.functions.when(lit(0) <= 0, lit(0L))
        .otherwise(sign_code(col("embedding"), lit(64), lit(0))).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(z.forall(_ == 0L))
    // array<double> input (round 17 — q79's pre-filter signs the
    // assignments' DOUBLE vectors): same bits as the float embedding
    // (the cast is sign-preserving), and same bits as the composed CASE
    // form over the double list
    val dbl = emb.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val badD = dbl.select(
        sign_code(col("v"), lit(0), lit(64)).as("d"),
        sign_code(col("embedding"), lit(0), lit(64)).as("f"),
        expr("""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
                 (acc, i) -> acc + CASE WHEN element_at(v, i + 1) > CAST(0 AS DOUBLE)
                   THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)""")
          .as("composed"))
      .filter(col("d") =!= col("f") || col("d") =!= col("composed"))
    assert(badD.count() == 0, "sign_code over array<double> diverges")
  }
}
