package graft

import graft.operators.Nms
import graft.plans.GreedyNms

/** The custom plan operator (GreedyNmsNode → Strategy → GreedyNmsExec):
  * result-identical to the typed flatMapGroups form, with the exchange +
  * sort planned from the operator's declared requirements. */
class PlansSpec extends SparkSpec {

  test("GreedyNmsExec ≡ flatMapGroups greedy NMS on the fixture") {
    import spark.implicits._
    val viaExec = Nms.greedyExecQuery(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val viaGroups = Nms.greedyQuery(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaExec.nonEmpty && viaExec == viaGroups)
  }

  test("planner satisfies the declared distribution + ordering requirements") {
    GraftExtensions.register(spark)
    val plan = GreedyNms(Nms.detectionsFromEvents(spark, sf), 0.3)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("GreedyNms"), s"strategy not applied:\n${plan.take(1200)}")
    assert(plan.contains("hashpartitioning(frame_id"),
      s"no frame_id exchange under the operator:\n${plan.take(1200)}")
    assert(plan.contains("conf#") && plan.contains("DESC"),
      s"no conf-desc sort under the operator:\n${plan.take(1200)}")
  }

  test("schema contract is checked up front") {
    val bad = Tables.events(spark, sf)
    val e = intercept[IllegalArgumentException](GreedyNms(bad, 0.3))
    assert(e.getMessage.contains("GreedyNms needs"))
  }
}
