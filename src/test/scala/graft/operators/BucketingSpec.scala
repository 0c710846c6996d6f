package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftSuite, SparkTestBase}

/** Bucketed co-located join: two tables bucketed on the join key plan an
  * exchange-free sort-merge join — the write-time layout pays for every
  * subsequent join.
  */
class BucketingSpec extends GraftSuite {

  test("join of co-bucketed tables plans no shuffle exchange") {
    // The in-memory catalog forgets tables between JVMs but their managed
    // locations persist — clear them so saveAsTable can recreate.
    for (t <- Seq("orders_bkt", "lineitem_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(s"/tmp/graft-test-warehouse/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    val orders = spark.read.parquet(s"${SparkTestBase.sf0001}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "orders_bkt", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_bkt", 4, Seq("o_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a non-broadcast join so the bucket layout (not broadcast)
      // is what eliminates the exchange.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
