package graft.operators

import graft.GraftSuite

/** As-of join semantics on a hand-built timeline: inclusive ties, no-match
  * nulls, per-key isolation, forward direction.
  */
class AsOfJoinSpec extends GraftSuite {
  import spark.implicits._

  private lazy val quotes = Seq(
    (1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"),
    (2L, 15L, "q15")
  ).toDF("k", "qts", "quote")

  private lazy val trades = Seq(
    (1L, 5L, "early"), // before any quote
    (1L, 20L, "tie"), // exactly at a quote
    (1L, 25L, "mid"),
    (2L, 99L, "other-key"),
    (3L, 50L, "no-quotes")
  ).toDF("k", "tts", "trade")

  test("backward: greatest quote ts <= trade ts, inclusive ties, null when none") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "early" -> None,
      "tie" -> Some("q20"),
      "mid" -> Some("q20"),
      "other-key" -> Some("q15"),
      "no-quotes" -> None))
  }

  test("forward: smallest quote ts >= trade ts") {
    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "tts", "qts")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "early" -> Some("q10"),
      "tie" -> Some("q20"),
      "mid" -> Some("q30"),
      "other-key" -> None,
      "no-quotes" -> None))
  }

  test("left rows are preserved exactly once (left-join cardinality)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts")
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === Seq("k", "tts", "trade", "qts", "quote"))
  }

  test("keyless as-of join: one global timeline") {
    val out = AsOfJoin.backward(
      trades.filter($"k" === 1).drop("k"), quotes.filter($"k" === 1).drop("k"),
      Seq.empty, "tts", "qts")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out === Map("early" -> None, "tie" -> Some("q20"), "mid" -> Some("q20")))
  }

  test("NULL join keys never match (equi-join semantics, unlike window grouping)") {
    val l = Seq((Option.empty[Long], 10L, "null-key"), (Some(1L), 10L, "keyed")).toDF("k", "tts", "trade")
    val r = Seq((Option.empty[Long], 5L, "null-quote"), (Some(1L), 5L, "q")).toDF("k", "qts", "quote")
    val out = AsOfJoin.backward(l, r, Seq("k"), "tts", "qts")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out === Map("null-key" -> None, "keyed" -> Some("q")))
  }

  test("tolerance: nearest match kept within the gap, nulled beyond it — never a farther fallback") {
    import org.apache.spark.sql.functions.lit
    // trade "mid" (25) matches q20 at gap 5; "other-key" (99) matches q15
    // at gap 84. tolerance 10: mid keeps its match, other-key's is nulled
    // (the row survives), and crucially other-key does NOT fall back to a
    // different quote — merge_asof's nearest-then-price order.
    val out = AsOfJoin.backwardWithin(trades, quotes, Seq("k"), "tts", "qts", lit(10L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "early" -> None,
      "tie" -> Some("q20"),   // gap 0
      "mid" -> Some("q20"),   // gap 5 <= 10
      "other-key" -> None,    // gap 84 > 10, row retained
      "no-quotes" -> None))
    val fwd = AsOfJoin.forwardWithin(trades, quotes, Seq("k"), "tts", "qts", lit(5L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(fwd === Map(
      "early" -> Some("q10"), // next quote at 10, gap 5 <= 5 (inclusive)
      "tie" -> Some("q20"),   // gap 0
      "mid" -> Some("q30"),   // gap 5 <= 5
      "other-key" -> None,    // no quote at or after 99
      "no-quotes" -> None))
  }

  test("colliding right payload names are rejected") {
    val bad = quotes.withColumnRenamed("quote", "trade")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, bad, Seq("k"), "tts", "qts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("reserved __graft_ prefixed input columns are rejected with a clear error") {
    val badLeft = trades.withColumnRenamed("trade", "__graft_asof_ord")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(badLeft, quotes, Seq("k"), "tts", "qts")
    }
    assert(e.getMessage.contains("reserved __graft_ prefix"))
    val badRight = quotes.withColumnRenamed("quote", "__GRAFT_x") // case-insensitive
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, badRight, Seq("k"), "tts", "qts")
    }
    assert(e2.getMessage.contains("reserved __graft_ prefix"))
  }
}
