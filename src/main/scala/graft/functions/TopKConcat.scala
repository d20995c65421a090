package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k ordered string concat as a typed Aggregator (SURVEY.md
  * §2.9 A10): keeps only the k best (score, name) pairs in the buffer
  * instead of collecting the whole group — at 100 TB a hot group's
  * collect_list holds millions of elements; this buffer holds k.
  *
  * Ordering: score DESC, then name ASC (ties) — identical to the
  * array_sort-based composition in Relational.q9, so results are
  * interchangeable and share the same oracle.
  */
class TopKConcat(k: Int) extends Aggregator[(Double, String), List[(Double, String)], String] {

  private def lt(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)   // "better" comes first

  private def insert(buf: List[(Double, String)], x: (Double, String)): List[(Double, String)] = {
    val (better, worse) = buf.span(lt(_, x))
    val merged = better ::: (x :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, String)] = Nil

  override def reduce(buf: List[(Double, String)], in: (Double, String)): List[(Double, String)] =
    insert(buf, in)

  override def merge(a: List[(Double, String)], b: List[(Double, String)]): List[(Double, String)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, String)]): String =
    buf.map(_._2).mkString(", ")

  override def bufferEncoder: Encoder[List[(Double, String)]] =
    Encoders.kryo[List[(Double, String)]]   // small (≤ k elements) opaque buffer
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopKConcat {
  /** Column-API entry: top-k names by score, comma-joined. */
  def top_k_concat(k: Int)(score: Column, name: Column): Column =
    udaf(new TopKConcat(k), Encoders.tuple(Encoders.scalaDouble, Encoders.STRING))
      .apply(score, name)
}
