package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local spot-checks via
    // tools/check_oracle.py); the driver always passes exactly two
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the shared factory (r16): Verify's inline builder was the third copy of
    // the session config and proved the hazard — it shipped a round without
    // the objectHashAggregate threshold and q34's sf10 exact search spilled
    // 73 GB where the hash path is answer-sized. One definition now.
    val spark = graft.core.Sessions.localCpus(cpus)
    new java.io.File(outDir).mkdirs()
    // default single-file dumps match the driver's reader; the sf10 heavy
    // gate (tools/check_oracle_sf10.py reads the whole directory) sets
    // SPARK_GRAFT_VERIFY_PARALLEL=1 to keep the billion-row writes parallel
    val parallelWrite = sys.env.get("SPARK_GRAFT_VERIFY_PARALLEL").contains("1")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        (if (parallelWrite) df else df.coalesce(1))
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
