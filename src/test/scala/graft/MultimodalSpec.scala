package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("binaryized schema carries payload + metadata struct") {
    val df = Multimodal.binaryized(spark, sf)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.count() > 0)
  }

  test("decode stub is deterministic and consistent with metadata") {
    val feats = Multimodal.decodeFeatures(Multimodal.binaryized(spark, sf))
    val a = feats.collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(Multimodal.binaryized(spark, sf))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "decode stub must be deterministic")
    // n_bytes from the decode path equals the metadata the writer recorded
    val meta = Multimodal.binaryized(spark, sf)
      .select(col("doc_id"), col("meta.n_bytes")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.forall(f => meta(f.doc_id) == f.n_bytes))
  }
}
