package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedLayout

class BucketedLayoutSpec extends SparkSpec {

  test("co-bucketed join plans with zero Exchange; point lookup prunes to one bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val orders = graft.core.Tables(spark, sfDir, "orders")
    val customer = graft.core.Tables(spark, sfDir, "customer")
    try {
      BucketedLayout.write(orders, "b_orders", s"$dir/orders", "o_custkey", 8,
        sortCols = Seq("o_custkey"))
      BucketedLayout.write(customer, "b_customer", s"$dir/customer", "c_custkey", 8,
        sortCols = Seq("c_custkey"))
      // forbid the broadcast fallback so the test proves BUCKET co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedLayout.table(spark, "b_orders")
        .join(BucketedLayout.table(spark, "b_customer"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      // rows must equal the plain (shuffling) join
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == plain)

      // filter-only queries drop the bucketed scan under autoBucketedScan
      // (no join/agg to profit) — turn it off to exercise bucket PRUNING
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val point = BucketedLayout.table(spark, "b_orders").filter(col("o_custkey") === 7L)
      val pp = point.queryExecution.executedPlan.toString
      assert(pp.contains("SelectedBucketsCount: 1 out of 8"),
        s"point lookup must prune to a single bucket:\n$pp")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      BucketedLayout.drop(spark, "b_orders")
      BucketedLayout.drop(spark, "b_customer")
    }
  }

  test("partitioned layout prunes non-matching partitions at the file index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = graft.core.Tables(spark, sfDir, "documents")
    graft.sources.PartitionedLayout.write(docs, s"$dir/docs", Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture needs multiple languages")
    val en = graft.sources.PartitionedLayout.read(spark, s"$dir/docs")
      .filter(col("lang") === "en")
    val p = en.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"the lang filter must prune at the partition level:\n$p")
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }
}
