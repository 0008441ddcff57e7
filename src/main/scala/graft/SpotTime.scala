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
      // FULL materialization, not count(): count() lets Catalyst prune every
      // projected column the row count doesn't need, and a per-row-expensive
      // projection then never runs — q138's scoring measured 0.12 s by
      // count() and 70+ s for real (the q155 lesson). Hashing a struct of
      // every column forces the whole row; map-typed outputs (unhashable)
      // fall back to count with a warning tag.
      import org.apache.spark.sql.functions.{col, count, lit, struct, sum, xxhash64}
      def consume(): (Long, String) = {
        val df = q(spark, sfDir)
        try {
          val r = df.select(count(lit(1)).as("n"),
            sum(xxhash64(struct(df.columns.map(col): _*)).cast("decimal(38,0)")).as("h")).head()
          (r.getLong(0), "")
        } catch { case _: org.apache.spark.sql.AnalysisException =>
          (q(spark, sfDir).count(), " [count-only: unhashable column]")
        }
      }
      consume() // warm-up: JIT, codegen, parquet footers
      val t0 = System.nanoTime()
      val (rows, tag) = consume()
      println(f"[spot] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)$tag")
    }
    spark.stop()
  }
}
