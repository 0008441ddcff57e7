package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Mechanical detector for trap #1 (HOF-lambda re-evaluation).
  *
  * Catalyst does not CSE inside higher-order-function lambdas, so any
  * derived expression a lambda body references re-evaluates PER ELEMENT —
  * O(elements · cost) where the author intended O(cost). Four sightings
  * (shinglesFromTokens, Int8Quantize, QualityClassifier.features,
  * Dsir.gramBuckets) plus a fifth variant where InferFiltersFromGenerate
  * re-inlined a bound alias below a Generate made this systemic; this is
  * the plan-level guard that makes a sixth sighting fail a spec instead of
  * hiding inside a correct answer.
  *
  * The precise, false-positive-free definition: a subtree INSIDE a lambda
  * body that references NO lambda variable is invariant across elements —
  * it should have been bound as an attribute outside the HOF. We flag such
  * invariant subtrees only when they contain an expensive node (string
  * split / regex / nested HOF / explicit blocklist below); `element_at(
  * boundAttr, i)` and friends stay legal because the attribute is a leaf.
  */
object PlanAudit {

  /** Expensive node types that must never re-evaluate per element. */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: StringSplit | _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll => true
    case _: HigherOrderFunction => true // a nested HOF re-running per element
    case _: ArrayDistinct | _: SortArray | _: ArraySort | _: Sequence => true
    case _: ScalaUDF => true
    case _ => false
  }

  /** Render one offender as "<lambda head> !! <invariant subtree head>". */
  private def describe(lambda: LambdaFunction, bad: Expression): String =
    s"${bad.sql.take(120)} (invariant inside ${lambda.function.prettyName} lambda)"

  /** Invariant-expensive-subtree offenders in every lambda of `plan`. */
  def lambdaInvariants(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def scanLambda(lf: LambdaFunction): Unit = {
      // maximal lambda-var-free subtrees of the body: walk top-down, stop
      // descending once a subtree is var-free (it is the hoistable unit)
      def walk(e: Expression): Unit = {
        val varFree = !e.exists(_.isInstanceOf[NamedLambdaVariable])
        if (varFree) {
          if (e.exists(isExpensive)) out += describe(lf, e)
          // do not descend: children are var-free too, this is the unit
        } else e.children.foreach(walk)
      }
      walk(lf.function)
    }
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case lf: LambdaFunction => scanLambda(lf)
        case _ => ()
      })
    }
    out.result().distinct
  }

  def lambdaInvariants(df: DataFrame): Seq[String] =
    lambdaInvariants(df.queryExecution.optimizedPlan)
}
