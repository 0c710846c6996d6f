package graft.merge

import graft.GraftSuite

/** Name-based entry point (B9): catalog/temp-view resolution with the
  * reference's validation gates (sp_SimpleMerge.sql:96-119).
  */
class SimpleMergeNameSpec extends GraftSuite {
  import spark.implicits._

  private lazy val fixtures: Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceGlobalTempView("tgt_b9")
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("src_b9")
  }

  test("qualified target + #temp source resolve and merge") {
    fixtures
    val merged = SimpleMerge.intoTable(spark, "global_temp.tgt_b9")
      .usingTable("#src_b9")
      .keys("k").delete("YES")
      .merged
    assert(merged.as[(Long, String)].collect().toSet === Set((2L, "B"), (3L, "c")))
  }

  test("missing table: reference-style not-found error") {
    fixtures
    val e = intercept[MergeValidationException] {
      SimpleMerge.intoTable(spark, "global_temp.nope_b9").usingTable("#src_b9")
    }
    assert(e.getMessage === "Target: global_temp.nope_b9 not found.")
  }

  test("bare permanent name: database qualification required") {
    fixtures
    val e = intercept[MergeValidationException] {
      SimpleMerge.intoTable(spark, "src_b9").usingTable("#src_b9")
    }
    assert(e.getMessage === "Target: src_b9 is invalid. Database name is required.")
  }

  test("source-side errors carry the Source role") {
    fixtures
    val e = intercept[MergeValidationException] {
      SimpleMerge.intoTable(spark, "global_temp.tgt_b9").usingTable("#missing_b9")
    }
    assert(e.getMessage === "Source: #missing_b9 not found.")
  }
}
