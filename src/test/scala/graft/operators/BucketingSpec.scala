package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the join key
  * with the same bucket count join WITHOUT any Exchange — the
  * pre-partitioning technique that turns a recurring 100-TB shuffle
  * join into a local merge per bucket.
  */
class BucketingSpec extends SparkSpec {

  test("join of same-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val facts = (0 until 10000).map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
      .toDF("k", "fact_id", "v")
    val dims = (0 until 500).map(i => (i.toLong, s"dim_$i")).toDF("k", "label")
    try {
      facts.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/facts").mode("overwrite").saveAsTable("b_facts")
      dims.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/dims").mode("overwrite").saveAsTable("b_dims")
      // disable broadcast so the bucketed path (not a broadcast) is what
      // avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"))
      assert(joined.count() === 10000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
