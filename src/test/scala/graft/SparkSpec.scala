package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.shared
  def sfDir: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val shared: SparkSession = {
    val s = graft.core.Graft.session(master = "local[4]", shufflePartitions = 4)
    s
  }
}
