package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Script-aware segmentation laws (C184): no-space-script text routes
  * to character/chunk grain, spaced text passes through IDENTICALLY
  * (application is the routing), the rewrite is idempotent, the
  * tokens-premise families REJECT unsegmented scriptless text instead
  * of silently degenerating, and the standalone dominant-script router
  * agrees with the scriptMix report.
  */
class ScriptSegmentSpec extends GraftSuite {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def segOne(text: String, runCap: Int = 1): String =
    docs(text).select(TextOps.segmentNoSpaceScripts(col("text"), runCap))
      .head().getString(0)

  test("identity on spaced-script text — the route is unconditionally applicable") {
    val latin = "the quick brown fox 123 jumps"
    assert(segOne(latin) === latin)
    assert(segOne(latin, runCap = 4) === latin)
    val cyrillic = "привет мир как дела"
    assert(segOne(cyrillic) === cyrillic)
  }

  test("per-codepoint grain with script-boundary isolation in mixed text") {
    assert(segOne("数据质量") === "数 据 质 量")
    assert(segOne("abc数据def") === "abc 数 据 def")
    // Kana and Thai are no-space scripts too.
    assert(segOne("テスト") === "テ ス ト")
    assert(segOne("ไทย") === "ไ ท ย")
  }

  test("runCap >= 2 chunks runs greedily left-to-right, remainder attached") {
    assert(segOne("数据质量决", runCap = 2) === "数据 质量 决")
    assert(segOne("机器学习模型训练", runCap = 4) === "机器学习 模型训练")
    assert(segOne("abc数据质def", runCap = 2) === "abc 数据 质 def")
  }

  test("idempotent at every runCap") {
    for (cap <- Seq(1, 2, 4); t <- Seq("数据质量决", "abc数据def", "plain text")) {
      val once = segOne(t, cap)
      assert(segOne(once, cap) === once, s"runCap=$cap text=$t")
    }
  }

  test("BPE learns intra-chunk han merges at runCap >= 2 (char grain has no pairs)") {
    val corpus = docs("数据质量数据管线数据去重", "数据数据数据")
    val seg2 = corpus.select(col("doc_id"),
      TextOps.segmentNoSpaceScripts(col("text"), runCap = 2).as("text"))
    val m = Bpe.train(seg2, "text", numMerges = 1).merges
    assert(m.nonEmpty && m.head.merged === "数据",
      s"expected the frequent chunk pair to merge, got $m")
    // At per-char grain every word is one symbol: nothing to merge.
    val seg1 = corpus.select(col("doc_id"),
      TextOps.segmentNoSpaceScripts(col("text"), runCap = 1).as("text"))
    assert(Bpe.train(seg1, "text", numMerges = 1).merges.isEmpty)
  }

  test("Bpe.train rejects unsegmented scriptless text, names the fix, accepts the routed corpus") {
    val sentence = "数据" * 120 // one 240-char whitespace "word"
    val raw = docs(sentence)
    val e = intercept[IllegalArgumentException] {
      Bpe.train(raw, "text", numMerges = 1)
    }
    assert(e.getMessage.contains("segmentNoSpaceScripts"))
    // The routed corpus trains fine; maxWordChars = 0 forces the raw one.
    val routed = raw.select(TextOps.segmentNoSpaceScripts(col("text")).as("text"))
    assert(Bpe.train(routed, "text", numMerges = 1).merges.isEmpty) // 1-char words
    assert(Bpe.train(raw, "text", numMerges = 1, maxWordChars = 0)
      .merges.nonEmpty)
  }

  test("noSpaceScriptCount is the routing signal") {
    val out = docs("abc数据def", "plain text", "テスト")
      .select(col("doc_id"), TextOps.noSpaceScriptCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 2L, 1L -> 0L, 2L -> 3L))
  }

  test("dominantScript agrees with scriptMix's dominant column") {
    val corpus = docs(
      "the quick brown fox", "привет мир", "数据质量很重要",
      "12345 678", "!!! ???", "click здесь for бесплатно prizes")
    val viaMix = TextStats.scriptMix(corpus, "doc_id", "text")
      .select("doc_id", "dominant")
    val viaExpr = corpus.select(col("doc_id"),
      TextStats.dominantScript(col("text")).as("dominant2"))
    val joined = viaMix.join(viaExpr, Seq("doc_id")).collect()
    assert(joined.length === 6)
    joined.foreach(r => assert(r.getString(1) === r.getString(2), r.toString))
  }
}
