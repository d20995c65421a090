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
    graft.functions.Md5Long.register(spark)
    graft.functions.WordShingles.register(spark)
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
}
