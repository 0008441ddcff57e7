package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.shared
  def sfDir: String = "/root/testdata/sf0.001"

  /** A finalized AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    * "== Initial Plan ==" sections — node-count plan guards must read only
    * the final one or every operator double-counts.
    */
  def finalPlanOnly(plan: String): String = {
    val i = plan.indexOf("== Initial Plan ==")
    if (i < 0) plan else plan.substring(0, i)
  }
}

object SparkSpec {
  lazy val shared: SparkSession = {
    val s = graft.core.Graft.session(master = "local[4]", shufflePartitions = 4)
    s
  }
}
