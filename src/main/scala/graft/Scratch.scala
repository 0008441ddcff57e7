package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val out = graft.operators.Reconcile.checksum(li, col("l_returnflag"),
      Seq(col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
        col("l_suppkey").cast("string"), col("l_linestatus")))
    out.orderBy("grp").show(false)
    li.filter(col("l_orderkey") === 0 && col("l_partkey") === 459)
      .select(col("l_orderkey"),
        graft.operators.Reconcile.rowHash(Seq(col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
          col("l_suppkey").cast("string"), col("l_linestatus"))).as("v"))
      .show(false)
    spark.stop()
  }
}
