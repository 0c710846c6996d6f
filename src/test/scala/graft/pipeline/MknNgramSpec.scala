package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Order-n modified-Kneser–Ney laws (C205): the generic estimator is
  * BIT-EQUAL to the dedicated trigram implementation at order 3 (same
  * expressions, same float evaluation order — the two paths cannot
  * drift); ngramCounts generalizes trigramCounts exactly; order 5
  * backs off through every level (doc-initial positions, unseen
  * contexts, OOV) with every token finite.
  */
class MknNgramSpec extends GraftSuite {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val corpus = docs(
    "the cat sat on the mat and the cat ran off the mat",
    "the dog sat on the rug and the dog ran",
    "a cat and a dog sat on a rug",
    "the cat sat on the mat again and again",
    "one two three four five six seven",
    "the end")

  test("ngramCounts at order 3 == trigramCounts, row for row") {
    val a = TextStats.ngramCounts(corpus, "text", 3)
      .orderBy("w1", "w2", "w3").collect().toSeq
    val b = TextStats.trigramCounts(corpus, "text")
      .orderBy("w1", "w2", "w3").collect().toSeq
    assert(a === b)
  }

  test("generic order 3 == mknTrigramNllAgainst BIT-FOR-BIT on cross-corpus scoring") {
    val model3 = TextStats.trigramCounts(corpus, "text")
    val probe = docs("the cat sat on a rug", "zz unseen words here",
      "the", "one two", "a dog ran off")
    val generic = TextStats.mknNgramNllAgainst(probe, model3, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val dedicated = TextStats.mknTrigramNllAgainst(probe, model3, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(generic === dedicated)
  }

  test("order 5: every token scores finite — doc-initial backoff, unseen contexts, OOV after seen context") {
    val model5 = TextStats.ngramCounts(corpus, "text", 5)
    val probe = docs(
      "the cat sat on the mat", // full 5-gram contexts available
      "zz",                     // single OOV token: unigram guard
      "the cat",                // pos 1-2 only: levels 1-2
      "the cat sat zz mat",     // OOV mid-context: unseen at every level
      "one two three")          // levels 1-3
    val rows = TextStats.mknNgramNllAgainst(probe, model5, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(!nll.isNaN && !nll.isInfinite, r.toString)
      assert(nll > 0.0, r.toString)
    }
    // Short docs score exactly as many tokens as they carry.
    assert(rows.map(_.getAs[Long]("n_tokens")).toSeq === Seq(6L, 1L, 2L, 5L, 3L))
  }

  test("order 5 separates in-domain from shuffled text (the gate signal)") {
    val model5 = TextStats.ngramCounts(corpus, "text", 5)
    val probe = docs(
      "the cat sat on the mat and the cat ran", // verbatim in-domain
      "mat the ran cat the and mat on sat cat") // same tokens, shuffled
    val byDoc = TextStats.mknNgramNllAgainst(probe, model5, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("avg_nll"))).toMap
    assert(byDoc(0L) < byDoc(1L),
      s"in-domain ${byDoc(0L)} should beat shuffled ${byDoc(1L)}")
  }

  test("deterministic across runs and partitionings") {
    val model5 = TextStats.ngramCounts(corpus, "text", 5)
    val probe = docs("the cat sat on the mat", "a dog ran off")
    def run(p: org.apache.spark.sql.DataFrame) =
      TextStats.mknNgramNllAgainst(p, model5, "doc_id", "text", 5)
        .orderBy("doc_id").collect().toSeq
    assert(run(probe) === run(probe.repartition(7)))
  }

  test("order < 3 and empty model fail loud") {
    val ex = intercept[IllegalArgumentException] {
      TextStats.mknNgramNllAgainst(corpus,
        TextStats.ngramCounts(corpus, "text", 5), "doc_id", "text", 2)
    }
    assert(ex.getMessage.contains("order"))
    val ex2 = intercept[IllegalArgumentException] {
      TextStats.mknNgramNllAgainst(docs("short"),
        TextStats.ngramCounts(docs("short"), "text", 5), "doc_id", "text", 5)
    }
    assert(ex2.getMessage.contains("empty"))
  }
}
