package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.DocsFunnel

/** The incremental funnel must reach exactly the batch q69 ledger on the
  * union of deliveries, at EVERY point where the fixed decontamination
  * list equals the delivered corpus's own test split — including a min-id
  * canonical revision that straddles deliveries. */
class DocsFunnelSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def deliver(df: DataFrame, dir: String, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("funnel_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def ledgerSet(df: DataFrame): Set[(Int, String, Long, Long)] =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  private def writeCorpus(df: DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("funnel_corpus").toString
    df.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("streaming funnel equals batch q69 after each delivery, with a min-id revision") {
    import spark.implicits._
    def hb(id: Long): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString, 16)
    val testId = (0L to 4000L).find(hb(_) >= 230).get
    val trainIds = (0L to 4000L).filter(hb(_) < 204).take(8)
    def toks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val contamText = "the " + toks(23, "c")
    val dupText    = "the " + toks(23, "d")
    val all = Seq(
      trainIds(0) -> toks(25, "zz"),
      trainIds(1) -> "the b c d e",
      trainIds(2) -> ("the " + Seq.fill(30)("w").mkString(" ")),
      trainIds(3) -> ("the " + toks(14, "u") + " " + Seq.fill(9)("r s").mkString(" ")),
      trainIds(4) -> contamText,
      testId      -> contamText,
      trainIds(5) -> dupText,   // smaller id — arrives LAST (forces revision)
      trainIds(6) -> dupText,
      trainIds(7) -> ("the " + toks(23, "e")))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(trainIds(5) < trainIds(6) || trainIds(6) < trainIds(5))
    val (small, big) = (math.min(trainIds(5), trainIds(6)),
                        math.max(trainIds(5), trainIds(6)))
    // delivery 1: everything except the SMALLER dup id; delivery 2 brings
    // it, so the stage-5 canonical for the dup family must be revised
    val d1 = all.filter(col("doc_id") =!= small)
    val d2 = all.filter(col("doc_id") === small)

    val corpusAll = writeCorpus(all)
    val corpusD1  = writeCorpus(d1)
    val fixedList = TextOps.testShingleSet(spark, corpusAll)
    val deliveryDir = java.nio.file.Files.createTempDirectory("funnel_in").toString
    val stateDir = java.nio.file.Files.createTempDirectory("funnel_state").toString

    deliver(d1, deliveryDir, "documents_d1.parquet")
    val q = DocsFunnel.start(spark, deliveryDir, fixedList, stateDir)
    try {
      q.processAllAvailable()
      // prefix contains the test doc, so the prefix corpus's own test
      // split equals the fixed list and batch q69 is directly comparable
      assert(ledgerSet(DocsFunnel.ledger(spark, stateDir)) ==
             ledgerSet(TextOps.q69_funnel(spark, corpusD1)),
        "ledger after delivery 1 diverges from batch q69 on the prefix")
      deliver(d2, deliveryDir, "documents_d2.parquet")
      q.processAllAvailable()
      val streamed = ledgerSet(DocsFunnel.ledger(spark, stateDir))
      assert(streamed == ledgerSet(TextOps.q69_funnel(spark, corpusAll)),
        "final ledger diverges from batch q69 on the union corpus")
      // the revision really happened: the dup family's survivor is the
      // small id delivered second (min-id, not first-arrival)
      val p4 = spark.read.parquet(s"$stateDir/p4")
        .groupBy("fp").agg(min(col("min_id")).as("gid"))
        .collect().map(_.getLong(1)).toSet
      assert(p4.contains(small) && !p4.contains(big))
    } finally q.stop()
  }

  test("ledger before the first micro-batch is the all-zero six-row frame") {
    val stateDir = java.nio.file.Files.createTempDirectory("funnel_state0").toString
    val names = Seq("raw", "lang_id", "quality", "repetition", "decontam", "dedup")
    assert(ledgerSet(DocsFunnel.ledger(spark, stateDir)) ==
           names.zipWithIndex.map { case (n, i) => (i, n, 0L, 0L) }.toSet)
  }

  test("pinned list older than the eval suite UNDER-flags: streaming keeps what batch drops") {
    // The equality contract's PRECONDITION, tested from the failing side
    // (VERDICT r9 #5): when the fixed decontamination list was pinned
    // BEFORE a new eval document arrived, the streaming funnel cannot
    // know the new document's shingles — so it can only UNDER-flag
    // relative to batch q69 on the union corpus (never over-flag: the
    // pinned list is a subset of the union test split's shingles, and a
    // train doc flagged against a subset is flagged against the
    // superset). Direction: streaming stage-4/5 survivors ⊇ batch's.
    import spark.implicits._
    def hb(id: Long): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString, 16)
    val testIds = (0L to 4000L).filter(hb(_) >= 230).take(2)
    val (testA, testB) = (testIds(0), testIds(1))
    val trainIds = (0L to 4000L).filter(hb(_) < 204).take(2)
    def toks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val contamA = "the " + toks(23, "c")
    val contamB = "the " + toks(23, "f")
    // trainIds(1) extends contamB (same shingles + a few more ⇒ ~85%
    // overlap, still a DISTINCT fingerprint from testB — otherwise the
    // stage-5 min-id election would absorb the stage-4 difference)
    val all = Seq(
      trainIds(0) -> contamA, testA -> contamA,             // flagged by BOTH sides
      trainIds(1) -> (contamB + " " + toks(4, "g")),        // flagged by batch only
      testB -> contamB)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d1 = all.filter(col("doc_id") =!= testB)
    val corpusAll = writeCorpus(all)
    // the fixed list is pinned from the PREFIX corpus — testB's shingles
    // are not in it
    val fixedList = TextOps.testShingleSet(spark, writeCorpus(d1))
    val deliveryDir = java.nio.file.Files.createTempDirectory("funnel_in3").toString
    val stateDir = java.nio.file.Files.createTempDirectory("funnel_state3").toString
    deliver(d1, deliveryDir, "documents_d1.parquet")
    deliver(all.filter(col("doc_id") === testB), deliveryDir, "documents_d2.parquet")
    val q = DocsFunnel.start(spark, deliveryDir, fixedList, stateDir)
    try {
      q.processAllAvailable()
      val streamed = ledgerSet(DocsFunnel.ledger(spark, stateDir))
      val batch = ledgerSet(TextOps.q69_funnel(spark, corpusAll))
      def at(m: Set[(Int, String, Long, Long)], stage: Int): (Long, Long) =
        m.collectFirst { case (`stage`, _, nd, nt) => (nd, nt) }.get
      // row-local stages agree — the divergence is decontamination only
      (0 to 3).foreach(i => assert(at(streamed, i) == at(batch, i),
        s"stage $i diverged — expected decontam-only divergence"))
      // the documented inequality direction, strictly: batch flags
      // trainIds(1) against testB's shingles, the pinned list cannot
      assert(at(streamed, 4)._1 == at(batch, 4)._1 + 1 &&
             at(streamed, 5)._1 == at(batch, 5)._1 + 1,
        "streaming must keep exactly the one train doc whose eval twin postdates the pinned list")
    } finally q.stop()
  }

  test("real-corpus parity split reaches the batch q69 ledger") {
    val docs = Tables.documents(spark, sf)
    val fixedList = TextOps.testShingleSet(spark, sf)
    val deliveryDir = java.nio.file.Files.createTempDirectory("funnel_in2").toString
    val stateDir = java.nio.file.Files.createTempDirectory("funnel_state2").toString
    deliver(docs.filter(col("doc_id") % 2 === 0), deliveryDir, "documents_even.parquet")
    deliver(docs.filter(col("doc_id") % 2 === 1), deliveryDir, "documents_odd.parquet")
    val q = DocsFunnel.start(spark, deliveryDir, fixedList, stateDir)
    try {
      q.processAllAvailable()
      assert(ledgerSet(DocsFunnel.ledger(spark, stateDir)) ==
             ledgerSet(TextOps.q69_funnel(spark, sf)),
        "streamed parity-split ledger diverges from batch q69 on the corpus")
    } finally q.stop()
  }
}
