package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * primitive a 100 TB ingest gates on): each rule is a row-level predicate
  * with a minimum pass rate; ALL rules evaluate in ONE aggregate over ONE
  * scan (no per-rule jobs), and the verdict table comes back with observed
  * rates. A predicate evaluating to NULL counts as a FAILURE for that row —
  * an expectation that can't be established isn't met.
  *
  * Pass rates are exact cross-engine: the mean of 0/1 doubles is an integer
  * sum over a count — no float-order sensitivity.
  *
  * Zero input rows FAIL CLOSED: the pass rate of an empty frame is 0.0, so
  * every rule with a positive threshold fails (a broken ingest that delivered
  * nothing must not sail through a NULL verdict), while `minPassRate = 0.0`
  * rules still pass.
  */
object Expectations {

  final case class Rule(name: String, predicate: Column, minPassRate: Double) {
    require(minPassRate >= 0.0 && minPassRate <= 1.0, s"bad minPassRate $minPassRate")
  }

  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val rateAggs = rules.zipWithIndex.map { case (r, i) =>
      avg(when(r.predicate, 1.0).otherwise(0.0)).as(s"__r$i")
    }
    val agged = df.agg(rateAggs.head, rateAggs.tail: _*)
    val verdicts = rules.zipWithIndex.map { case (r, i) =>
      val rate = coalesce(col(s"__r$i"), lit(0.0))
      struct(lit(r.name).as("rule"), rate.as("pass_rate"),
        lit(r.minPassRate).as("min_pass_rate"),
        (rate >= r.minPassRate).as("passed"))
    }
    agged.select(explode(array(verdicts: _*)).as("v"))
      .select(col("v.rule"), col("v.pass_rate"), col("v.min_pass_rate"), col("v.passed"))
  }

  /** Row-level quarantine routing — [[check]]'s sibling for pipelines that
    * must KEEP flowing: instead of a table-level verdict, every row is
    * tagged with the rules it violates (`violations`, comma-joined sorted
    * names, '' when clean) so the caller splits `filter(col("violations") ===
    * "")` → main path, rest → quarantine sink with the reason attached (the
    * dead-letter-queue discipline). Row-local projection, zero shuffle, scan
    * speed; NULL predicates count as violations, matching [[check]].
    *
    * `minPassRate` deliberately plays no role here: routing is per-row;
    * rate thresholds are a table-level gate ([[check]]).
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val tags = rules.sortBy(_.name).map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name)))
    df.withColumn("violations", concat_ws(",", tags: _*))
  }
}
