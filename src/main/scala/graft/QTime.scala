package graft

/** Bench-methodology single-query timer for A/B work during optimization
  * rounds: one warm-up, then min-of-N (default 5) of `builder(...).count()`
  * — exactly Bench's estimator, isolated to the named queries so an A/B
  * doesn't pay a full three-group run per reading.
  *
  * Run: sbt "runMain graft.QTime <sfDir> <query> [query ...]"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <queryName> [queryName ...]")
    val sfDir = args(0)
    val repeats = sys.env.getOrElse("QTIME_REPEATS", "5").toInt
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.drop(1).foreach { name =>
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      // NonFatal only (ADVICE r16): an OOM/fatal error must propagate — a
      // timing taken after one would come from a corrupted JVM
      try q(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () } // warm-up
      var best = Double.MaxValue
      var worst = 0.0
      var rows = -1L
      var lastFailure: Throwable = null
      var r = 0
      while (r < repeats) {
        val t0 = System.nanoTime()
        val n =
          try q(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(e) => lastFailure = e; -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        if (n >= 0 && sec < best) { best = sec; rows = n }
        if (sec > worst) worst = sec
        r += 1
      }
      if (rows < 0)
        println(s"[qtime] $name: FAILED (every repeat threw; last: $lastFailure)")
      else
        println(f"[qtime] $name: min $best%.3f s worst $worst%.3f s ($rows rows, $repeats repeats)")
    }
    spark.stop()
  }
}
