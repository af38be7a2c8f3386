package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md co-located-join claim: bucketing both
  * sides of a fact-fact join on the key removes the per-query shuffle
  * entirely (the one-time bucketed write pays it instead). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and the database is dropped at the end
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bucketed")
    try {
      val orders = spark.read.parquet(s"$sf001/orders.parquet")
      val customer = spark.read.parquet(s"$sf001/customer.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_bucketed.orders_b")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_bucketed.customer_b")

      // disable broadcast so the join would otherwise shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bucketed.orders_b")
          .join(spark.table("graft_bucketed.customer_b"),
            col("o_custkey") === col("c_custkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() == orders.count()) // every order has a customer

        // control: the same join over plain parquet DOES shuffle
        val control = orders.join(customer, col("o_custkey") === col("c_custkey"))
        val controlPlan = control.queryExecution.executedPlan.toString
        assert(controlPlan.contains("Exchange hashpartitioning"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bucketed CASCADE")
    }
  }
}
