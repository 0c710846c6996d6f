package graft.pipeline

import graft.GraftSuite

/** Script-mix laws (C177): hand-checked subtraction counts per script
  * class, dominant priority tie-break, the mixed-script flag threshold,
  * empty-text totality, and validation.
  */
class ScriptMixSpec extends GraftSuite {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def mix(texts: String*) =
    TextStats.scriptMix(docs(texts: _*), "doc_id", "text")
      .collect().map(r => (r.getString(6), r.getBoolean(7),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("hand-checked counts: pure scripts dominate, fractions exclude spaces") {
    // "привет мир": 10 chars, 9 Cyrillic, 1 space.
    val Array((dom, mixed, fl, fc, _, _)) = mix("привет мир")
    assert(dom === "cyrillic" && !mixed && fl === 0.0 && fc === 0.9)
    val Array((domH, _, _, _, fh, _)) = mix("你好世界")
    assert(domH === "han" && fh === 1.0)
  }

  test("mixed-script flag: two classes above the threshold") {
    // "click здесь": 5 Latin + 5 Cyrillic of 11 chars — both ≥ 0.2.
    val Array((_, mixed, fl, fc, _, _)) = mix("click здесь")
    assert(mixed && fl > 0.2 && fc > 0.2)
    // Pure Latin with a stray digit below threshold stays unmixed.
    val Array((dom2, mixed2, _, _, _, _)) = mix("hello there friend 1")
    assert(dom2 === "latin" && !mixed2)
  }

  test("dominant tie-break is priority-ordered; no-script text is 'other'") {
    // 2 Latin vs 2 Cyrillic vs 2 digits — exact tie, latin wins by priority.
    val Array((dom, _, _, _, _, _)) = mix("ab яж 12")
    assert(dom === "latin")
    val Array((domO, mixedO, fl, fc, fh, fd)) = mix("!!! ???")
    assert(domO === "other" && !mixedO && Seq(fl, fc, fh, fd).forall(_ === 0.0))
  }

  test("empty text is total (no division blowup); threshold validated") {
    val Array((dom, mixed, _, _, _, _)) = mix("")
    assert(dom === "other" && !mixed)
    intercept[IllegalArgumentException] {
      TextStats.scriptMix(docs("x"), "doc_id", "text", mixThreshold = 0.0)
    }
  }
}
