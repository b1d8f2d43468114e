package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit assertions as a regression suite: the scale-critical plan
  * shapes (pushdown reaching the scan, dimensions broadcast, no cartesian
  * products, top-k without global sort) must hold on every build, not only
  * when the audit tool is run by hand.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("AQE splits a deliberately skewed join partition (runtime probe)") {
    assert(graft.tools.PlanAudit.skewJoinHandled(spark),
      "adaptive executed plan lacks skew=true — AQE skew-join handling regressed")
  }

  graft.tools.PlanAudit.Audited.foreach { case (name, checks) =>
    test(s"$name plan shape") {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      lazy val codegenPlan =
        df.queryExecution.explainString(ExplainMode.fromString("codegen"))
      checks.foreach { case (what, needle) =>
        val shown = if (needle.startsWith("codegen:")) codegenPlan else plan
        assert(graft.tools.PlanAudit.holds(plan, codegenPlan, needle),
          s"$name: $what (needle '$needle')\n$shown")
      }
    }
  }
}
