package graft

import org.scalatest.funsuite.AnyFunSuite

/** The storm self-adjudication's mover selection (round 15, VERDICT r14
  * #4) — the pure half of the mechanism, pinned so the two signals and
  * their exclusions can't drift: pass-disagreement movers (median/min >
  * 1.3, min ≥ 0.3 s, top 5 by absolute spread), the heavy tail (top 3
  * mins ≥ 1 s — the only reference-free way to see a storm that spans
  * ALL of a query's samples), floor-class and rider exclusions. */
class BenchAdjudicateSpec extends AnyFunSuite {

  private def v(xs: Double*) = xs.toVector

  test("disagreeing passes select; agreeing or floor-class do not") {
    val s = Map(
      "q_polluted"  -> v(0.5, 2.0, 2.1),   // min 0.5, median 2.0 → disagree
      "q_steady"    -> v(0.5, 0.52, 0.55), // agrees → out
      "q_floor"     -> v(0.05, 0.40, 0.42) // min < 0.3 → floor class, out
    )
    assert(Bench.adjudicationMovers(s, Set.empty) == Seq("q_polluted"))
  }

  test("the heavy tail qualifies even with agreeing passes (the all-passes-polluted case)") {
    val s = Map(
      "q_heavy"  -> v(5.0, 5.1, 5.2),   // median/min ≈ 1 — spread-blind
      "q_small"  -> v(0.6, 0.61, 0.62)
    )
    assert(Bench.adjudicationMovers(s, Set.empty) == Seq("q_heavy"))
  }

  test("caps: top 5 by spread + top 3 by min, dedup, deterministic order") {
    val disagree = (1 to 8).map(i =>
      f"q_d$i%02d" -> v(0.5, 0.5 + i * 0.5, 0.6 + i * 0.5)).toMap
    val heavy = (1 to 5).map(i =>
      f"q_h$i%02d" -> v(10.0 + i, 10.1 + i, 10.2 + i)).toMap
    val got = Bench.adjudicationMovers(disagree ++ heavy, Set.empty)
    // 5 biggest spreads (d08..d04) then 3 biggest mins (h05..h03)
    assert(got == Seq("q_d08", "q_d07", "q_d06", "q_d05", "q_d04",
                      "q_h05", "q_h04", "q_h03"))
    // a query qualifying through both signals appears once
    val both = Map("q_x" -> v(2.0, 9.0, 9.1))
    assert(Bench.adjudicationMovers(both, Set.empty) == Seq("q_x"))
  }

  test("riders are excluded from both signals") {
    val s = Map(
      "q35_minhash_lsh" -> v(0.5, 3.0, 3.1), // disagrees, but a rider
      "q69_funnel"      -> v(9.0, 9.1, 9.2), // heavy, but a rider
      "q_real"          -> v(1.5, 1.51, 1.52)
    )
    assert(Bench.adjudicationMovers(
      s, Set("q35_minhash_lsh", "q69_funnel")) == Seq("q_real"))
  }

  test("empty and all-excluded inputs select nothing") {
    assert(Bench.adjudicationMovers(Map.empty, Set.empty).isEmpty)
    assert(Bench.adjudicationMovers(
      Map("q" -> v(0.1, 0.1, 0.1)), Set.empty).isEmpty)
  }

  // ---- the stdout-artifact adjudication field (round 16, VERDICT r15 #3)

  test("adj field: idle run carries rulers + spread, no movers block") {
    assert(Bench.adjudicationJson(0.176, 0.18, 5, Nil, Map.empty, Map.empty)
      == ""","adj":{"st":[0.18,0.18],"sp":5}""")
  }

  test("adj field: fired run carries [suite-min, re-read] per mover, head-token keys") {
    val got = Bench.adjudicationJson(0.31, 0.19, 26,
      Seq("q38_decontamination", "q28_avg_price"),
      Map("q38_decontamination" -> 9.754, "q28_avg_price" -> 4.67),
      Map("q38_decontamination" -> 8.34, "q28_avg_price" -> 5.1))
    // q38 folded (re-read < suite), q28's re-read was slower — both pairs
    // published so the artifact shows the fold AND the refusal
    assert(got ==
      ""","adj":{"st":[0.31,0.19],"sp":26,"m":{"q38":[9.75,8.34],"q28":[4.67,5.1]}}""")
  }

  test("adj field: head-token collision falls back to full-name keys (ADVICE r16)") {
    val got = Bench.adjudicationJson(0.2, 0.2, 10,
      Seq("q34_ngram_jaccard", "q34b_ngram_variant"),
      Map("q34_ngram_jaccard" -> 2.0, "q34b_ngram_variant" -> 1.5),
      Map("q34_ngram_jaccard" -> 1.8, "q34b_ngram_variant" -> 1.4))
    // both movers head-tokenize to distinct q34/q34b here — force a true
    // collision with two movers sharing the SAME head token
    assert(got.contains(""""q34":[2,1.8]""") && got.contains(""""q34b":[1.5,1.4]"""))
    val collided = Bench.adjudicationJson(0.2, 0.2, 10,
      Seq("q34_ngram_jaccard", "q34_other_family"),
      Map("q34_ngram_jaccard" -> 2.0, "q34_other_family" -> 1.5),
      Map("q34_ngram_jaccard" -> 1.8, "q34_other_family" -> 1.4))
    assert(collided ==
      ""","adj":{"st":[0.2,0.2],"sp":10,"m":{"q34_ngram_jaccard":[2,1.8],"q34_other_family":[1.5,1.4]}}""")
  }

  test("adj field: a mover whose re-reads all failed is omitted from the map") {
    val got = Bench.adjudicationJson(0.25, 0.25, 30,
      Seq("q2_dedup_merge"), Map("q2_dedup_merge" -> 3.0), Map.empty)
    assert(got == ""","adj":{"st":[0.25,0.25],"sp":30,"m":{}}""")
  }

  // ---- cross-round drift selection + rendering (round 17, VERDICT r16 #6)

  test("prior movers: both absolute and relative thresholds must fire, either direction") {
    val prior = Map("q2" -> 0.47, "qslow" -> 2.0, "qsmall" -> 0.1,
                    "qbig" -> 10.0, "qgone" -> 1.0)
    val suite = Map("q2" -> 0.84,   // +0.37, 1.79× → selects (the r16 case)
                    "qslow" -> 1.2, // −0.8, 1.67× → selects (speedups too)
                    "qsmall" -> 0.2, // 2× but Δ=0.1 < 0.25 → out
                    "qbig" -> 11.0, // Δ=1.0 but 1.1× < 1.3 → out
                    "qnew" -> 5.0)  // no prior entry → out
    assert(Bench.priorMovers(prior, suite) == Seq("qslow", "q2"))
  }

  test("prior movers: top-3 by absolute delta, name-tiebroken, deterministic") {
    val prior = (1 to 5).map(i => f"q$i%02d" -> 1.0).toMap
    val suite = Map("q01" -> 2.0, "q02" -> 2.5, "q03" -> 3.0,
                    "q04" -> 2.0, "q05" -> 1.1)
    // deltas 1.0/1.5/2.0/1.0/0.1 → top3 = q03, q02, then q01 before q04
    assert(Bench.priorMovers(prior, suite) == Seq("q03", "q02", "q01"))
    assert(Bench.priorMovers(Map.empty, suite).isEmpty)
    // -1 (failed-query marker) on either side never qualifies
    assert(Bench.priorMovers(Map("qf" -> -1.0), Map("qf" -> 3.0)).isEmpty)
    assert(Bench.priorMovers(Map("qf" -> 3.0), Map("qf" -> -1.0)).isEmpty)
  }

  test("prior block: [prior, suite, reread] triples; no-reread movers keep the pair form") {
    val got = Bench.priorJson(Seq("q2", "q35"),
      Map("q2" -> 0.47, "q35" -> 1.7), Map("q2" -> 0.84, "q35" -> 0.92),
      Map("q2" -> 0.8))
    // q35 is a rider — drift disclosed, no re-read verdict element
    assert(got == ""","prior":{"q2":[0.47,0.84,0.8],"q35":[1.7,0.92]}""")
    assert(Bench.priorJson(Nil, Map.empty, Map.empty, Map.empty) == "")
  }

  test("adj field carries the prior block after the movers map") {
    val pb = Bench.priorJson(Seq("q2"), Map("q2" -> 0.47),
      Map("q2" -> 0.84), Map("q2" -> 0.8))
    val got = Bench.adjudicationJson(0.18, 0.18, 5, Nil, Map.empty,
      Map.empty, pb)
    assert(got ==
      ""","adj":{"st":[0.18,0.18],"sp":5,"prior":{"q2":[0.47,0.84,0.8]}}""")
  }
}
