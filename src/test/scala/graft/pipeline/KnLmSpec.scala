package graft.pipeline

import graft.GraftSuite

/** Kneser–Ney bigram laws (C181): the conditional sums to exactly 1
  * over the vocabulary for a seen context (the interpolation weights
  * are exact by construction), the continuation distribution fixes the
  * "San Francisco" failure raw-frequency backoff has, hand-checked
  * arithmetic, and validation.
  */
class KnLmSpec extends GraftSuite {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("conditional sums to 1 over the vocabulary for a seen context (enumeration)") {
    val corpus = docs("a b a c a b d c a b")
    val model = TextStats.bigramCounts(corpus, "text")
    // Enumerate p(w|'a') over the full vocab by scoring 2-token docs and
    // inverting the NLL: p = exp(-2·avg_nll + ln p0) is awkward — score
    // single bigrams directly instead via a probe doc per vocab word and
    // recover ln p(w|a) as -(2·avg_nll) - ln p('a'-initial).
    val vocab = Seq("a", "b", "c", "d")
    val probes = docs(vocab.map(w => s"a $w"): _*)
    val nll = TextStats.knBigramNllAgainst(probes, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // Every probe shares the same first-token term ln p_guard('a'); the
    // per-word conditional is exp(-(2·avg_nll) - ln p_first).
    val big = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = big.size.toDouble
    val n1bwdA = big.keys.count(_._2 == "a")
    val v = 4.0
    val pFirst = (n1bwdA + 1.0) / (b + v)
    val total = vocab.indices.map { i =>
      math.exp(-(2.0 * nll(i.toLong)) - math.log(pFirst))
    }.sum
    // avg_nll is reported 6dp-rounded; inverting through exp leaves each
    // recovered p with ~2e-6 relative error, so the enumerated sum can
    // sit within ~1e-5 of the exact 1.
    assert(math.abs(total - 1.0) < 1e-5, s"sum over vocab was $total")
  }

  test("continuation fixes the San-Francisco failure: frequent-but-single-context scores below diverse-context") {
    // 'francisco' occurs 4x, always after 'san'; 'mixed' occurs 3x after
    // three different contexts. Raw frequency prefers 'francisco';
    // continuation counts prefer 'mixed'.
    val corpus = docs(
      "san francisco san francisco san francisco san francisco",
      "one mixed two mixed three mixed")
    val model = TextStats.bigramCounts(corpus, "text")
    // Probe with an UNSEEN context so both words score the continuation
    // (guard) distribution.
    val probes = docs("zzz francisco", "zzz mixed")
    val out = TextStats.knBigramNllAgainst(probes, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) > out(1L), s"francisco=${out(0L)} should exceed mixed=${out(1L)}")
  }

  test("hand-checked arithmetic on 'a b a b'") {
    // big: (a,b)=2, (b,a)=1 → B=3... wait: pairs of "a b a b": (a,b),(b,a),(a,b)
    // → big: (a,b)=2, (b,a)=1; B=2 types... and types = {(a,b),(b,a)} → B=2.
    // ctx: a: cv=2, n1fwd=1; b: cv=1, n1fwd=1. cont: b: n1bwd=1; a: n1bwd=1.
    // V = 2. pos0 'a': guard = (1+1)/(2+2) = 0.5.
    // pos1 'b'|a: (max(2−.75,0) + .75·1·(1/2))/2 = (1.25 + 0.375)/2 = 0.8125.
    // pos2 'a'|b: (max(1−.75,0) + .75·1·(1/2))/1 = 0.625.
    // pos3 'b'|a: 0.8125.
    val expected = BigDecimal(-(math.log(0.5) + math.log(0.8125) +
        math.log(0.625) + math.log(0.8125)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextStats.knBigramNll(docs("a b a b"), "doc_id", "text").head()
    assert(out.getLong(1) === 4L && out.getDouble(2) === expected)
  }

  test("discount validation") {
    intercept[IllegalArgumentException] {
      TextStats.knBigramNll(docs("a b"), "doc_id", "text", discount = 1.0)
    }
  }

  test("OOV word after a SEEN context scores a finite NLL (cross-corpus probe)") {
    // Model knows 'san' as a context; 'zzz' is OOV (no bigram, no
    // continuation count) — the raw KN mixture is 0 there, and the
    // add-1 guard must catch it rather than emit log(0) = NULL.
    val model = TextStats.bigramCounts(
      docs("san francisco san francisco other words here"), "text")
    val out = TextStats.knBigramNllAgainst(docs("san zzz"), model, "doc_id", "text")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(!r.isNullAt(2), "avg_nll must be finite for OOV-after-seen-context")
    // The guard term for pos1 is (0+1)/(B+V); pos0 'san' has n1bwd=1 →
    // (1+1)/(B+V). B=5 types... recompute: pairs (san,francisco)x2,
    // (francisco,san), (francisco,other), (other,words), (words,here) →
    // B=5 types; vocab {san,francisco,other,words,here} V=5.
    // pos0: ln(2/10); pos1: 'zzz'|'san' seen ctx but zero mixture → guard
    // ln(1/10).
    val expected = BigDecimal(-(math.log(2.0 / 10) + math.log(1.0 / 10)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) === expected)
  }
}
