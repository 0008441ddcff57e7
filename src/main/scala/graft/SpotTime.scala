package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc spot timer for individual catalog queries (the BASELINE.md
  * "spot-times" runs): warm-up pass then one timed pass per query, same
  * session settings as Bench.
  *
  * Run: sbt "runMain graft.SpotTime <sfDir> <queryName> [queryName ...]"
  */
object SpotTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpotTime <sfDir> <queryName> [queryName ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    args.drop(1).foreach { name =>
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      q(spark, sfDir).count() // warm-up: JIT, codegen, parquet footers
      val t0 = System.nanoTime()
      val rows = q(spark, sfDir).count()
      println(f"[spot] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
