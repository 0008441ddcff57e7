package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewedJoin

class SkewedJoinSpec extends SparkSpec {
  test("salted join equals plain inner join on skewed data") {
    val big = spark.range(20000).select(
      when(col("id") < 18000, 7L).otherwise(pmod(col("id"), lit(100))).as("k"),
      col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k2"), concat(lit("dim"), col("id")).as("name"))
    val plain = big.join(small, big("k") === small("k2"))
      .select("payload", "name").orderBy("payload").collect().map(_.toSeq).toSeq
    val salted = SkewedJoin(big, small, "k", "k2", saltBuckets = 8)
      .select("payload", "name").orderBy("payload").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
