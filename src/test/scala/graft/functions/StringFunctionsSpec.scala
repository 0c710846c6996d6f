package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Specs for the native NfcNormalize expression: composition semantics,
  * identity fast path, both evaluation modes, SQL availability.
  */
class StringFunctionsSpec extends GraftSuite {
  import spark.implicits._

  private val decomposedE = "e\u0301"      // e + combining acute
  private val composedE = "\u00e9"         // é
  private val decomposedA = "A\u030A"      // A + combining ring
  private val composedA = "\u00c5"         // Å

  private def nfc = (c: org.apache.spark.sql.Column) =>
    call_function(GraftFunctions.NfcNormalizeName, c)

  test("decomposed sequences compose; composed and ASCII are identity") {
    val df = Seq(
      (1L, decomposedE + decomposedA),
      (2L, composedE + composedA),
      (3L, "plain ascii"),
      (4L, "")
    ).toDF("id", "s")
    val m = df.select($"id", nfc($"s"), length(nfc($"s")))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    assert(m(1L) === ((composedE + composedA, 2)))
    assert(m(2L) === ((composedE + composedA, 2)))
    assert(m(3L) === (("plain ascii", 11)))
    assert(m(4L) === (("", 0)))
  }

  test("null propagates") {
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(nfc($"s")).collect().head.isNullAt(0))
  }

  test("codegen and interpreted evaluation agree") {
    val df = Seq(decomposedE, composedE, "x" + decomposedA, "").toDF("s")
    val withCodegen = df.select(nfc($"s")).as[String].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(nfc($"s")).as[String].collect().toSeq
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("registered for SQL via GraftExtensions") {
    Seq(decomposedE).toDF("s").createOrReplaceTempView("sf_strs")
    val r = spark.sql("SELECT graft_nfc_normalize(s) AS n FROM sf_strs")
      .as[String].head()
    assert(r === composedE)
  }

  test("normalized exact-dedup: two spellings of one text hash together") {
    val docs = Seq((1L, "caf" + composedE), (2L, "caf" + decomposedE))
      .toDF("doc_id", "text")
    val distinctRaw = docs.select("text").distinct().count()
    val distinctNfc = docs.select(nfc($"text").as("text")).distinct().count()
    assert(distinctRaw === 2L && distinctNfc === 1L)
  }

  private def tc = (c: org.apache.spark.sql.Column) =>
    call_function(GraftFunctions.TokenCountName, c)

  test("token count == size(split) on every edge: empties, runs of spaces, multi-byte, null") {
    val df = Seq(
      Some("a b c"), Some(""), Some(" "), Some("a  b"), Some("trailing "),
      Some(" leading"), Some("caf" + composedE + " " + decomposedE + "x"), None
    ).toDF("s")
    val native = df.select(tc($"s")).as[Option[Int]].collect().toSeq
    val viaSplit = df.select(size(split($"s", " "))).as[Option[Int]].collect().toSeq
    // size() returns -1 for null under legacy conf; compare via Option rows.
    assert(native === Seq(Some(3), Some(1), Some(2), Some(3), Some(2), Some(2), Some(2), None))
    assert(native.zip(viaSplit).forall {
      case (Some(a), Some(b)) => a == b
      case (None, _) => true // split-of-null conventions differ; native is null
      case _ => false
    })
  }

  test("token count: codegen and interpreted evaluation agree") {
    val df = Seq("a b", "", "x  y z ").toDF("s")
    val withCodegen = df.select(tc($"s")).as[Int].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.select(tc($"s")).as[Int].collect().toSeq === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("gram rolling hash: SQL-registered, codegen == interpreted, literal-arg guard, type guard") {
    // Registered through GraftExtensions for plain SQL.
    val viaSql = spark.sql(
      "SELECT graft_gram_rolling_hash(split('a b c d', ' '), 2, 43L) AS h")
      .as[Seq[Long]].head()
    assert(viaSql.length === 3)
    assert(viaSql.distinct.length === 3)
    // Codegen and interpreted agree.
    val df = Seq("a b c d e", "a b", "x").toDF("s")
    def sweep() = df.selectExpr("graft_gram_rolling_hash(split(s, ' '), 2, 43L) AS h")
      .as[Seq[Long]].collect().toSeq
    val withCodegen = sweep()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(sweep() === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // Shorter-than-n docs produce the empty array, not an error.
    assert(withCodegen(2) === Seq.empty)
    // n and seed must be literals (the builder extracts them at plan
    // time); a column argument is rejected, not silently mis-planned.
    val err = intercept[Exception] {
      Seq((Seq("a", "b"), 2)).toDF("w", "n")
        .selectExpr("graft_gram_rolling_hash(w, n, 43L)").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
    // A foldable NULL literal is rejected with the same clean message,
    // not an opaque plan-time NPE (ADVICE r13 #2).
    for (sql <- Seq(
      "graft_gram_rolling_hash(split('a b', ' '), CAST(NULL AS INT), 43L)",
      "graft_gram_rolling_hash(split('a b', ' '), 2, CAST(NULL AS BIGINT))")) {
      val nullErr = intercept[Exception] {
        spark.sql(s"SELECT $sql").collect()
      }
      assert(nullErr.getMessage.contains("non-null literal"), nullErr.getMessage)
    }
  }
}
