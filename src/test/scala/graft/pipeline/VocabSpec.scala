package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Vocabulary-construction laws (C170–C171): deterministic rank with the
  * (count DESC, token ASC) tie-break, dense ids, the vocab-size bound,
  * position-faithful encoding, and OOV ids confined to the bucket range
  * above the vocab.
  */
class VocabSpec extends GraftSuite {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "b b b a a c"),
      (2L, "a b d"),
      (3L, "a x")).toDF("doc_id", "text")
  }
  // counts: a=4, b=4, c=1, d=1, x=1

  test("build: rank by count desc then token asc, dense 0-based ids, bound respected") {
    val v = Vocab.build(corpus, "text", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // a and b tie at 4 — 'a' wins lexically; c/d/x tie at 1 — 'c' takes
    // the last slot.
    assert(v.toSeq === Seq((0L, "a", 4L), (1L, "b", 4L), (2L, "c", 1L)))
  }

  test("encode: positions faithful, in-vocab ids from the vocab, OOV in [V, V+buckets)") {
    val v = Vocab.build(corpus, "text", vocabSize = 3)
    val e = Vocab.encode(corpus.filter(col("doc_id") === 2L), "doc_id", "text",
        v, vocabSize = 3, oovBuckets = 4, seed = 9)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(e.map(_._1).toSeq === Seq(0L, 1L, 2L)) // a b d
    assert(e(0)._2 === 0L && e(1)._2 === 1L)      // in-vocab
    assert(e(2)._2 >= 3L && e(2)._2 < 7L)         // OOV 'd' → bucket range
  }

  test("encode is total and deterministic: every token gets exactly one id, same on re-run") {
    val v = Vocab.build(corpus, "text", vocabSize = 2)
    def run() = Vocab.encode(corpus, "doc_id", "text", v,
        vocabSize = 2, oovBuckets = 8, seed = 3)
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    val a = run()
    assert(a.length === corpus.select(explode(split(col("text"), " "))).count())
    assert(a === run())
    // Same OOV token → same bucket everywhere (it's a hash, not a roll).
    val cIds = Vocab.encode(corpus, "doc_id", "text", v, 2, 8, 3)
      .join(corpus.select(col("doc_id")), Seq("doc_id"))
      .filter(col("token_id") >= 2).select("token_id").distinct().count()
    // OOV tokens here: c, d, x — at most 3 distinct bucket ids.
    assert(cIds <= 3)
  }
}
