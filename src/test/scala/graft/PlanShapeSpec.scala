package graft

import graft.analytics.Queries

/** Plan-shape regression guards for silently-degrading physical plans.
  *
  * The r6 q2 lesson: `min_by(struct...)` LOOKS like a plain aggregate but
  * its struct-typed buffer cannot live in HashAggregate's fixed-width hash
  * map, so Spark silently falls back to SortAggregate — a full
  * per-partition sort of the joined fact table (6x slowdown at sf0.1, and
  * a scale-killer at 100 TB). The fix keys the fact-side fold on
  * (brand, supplier) with a primitive min() buffer; this spec pins that
  * the fact-side partial really plans as a HashAggregate.
  */
class PlanShapeSpec extends SparkSpec {

  test("q2: fact-side partial argmin plans as HashAggregate") {
    val plan = Queries.q2MinCost(spark, Sf).queryExecution.executedPlan.toString
    val factPartial = plan.linesIterator.find(_.contains("partial_min(unit_price"))
    assert(factPartial.isDefined, s"fact-side partial_min(unit_price) not found:\n$plan")
    assert(factPartial.get.contains("HashAggregate"),
      s"fact-side partial agg fell back off HashAggregate:\n${factPartial.get}")
    // the struct argmin (min_by) may only run ABOVE the (brand, supplier)
    // fold — i.e. never directly over the fact join output
    plan.linesIterator.filter(_.contains("partial_min_by")).foreach { l =>
      assert(l.contains("SortAggregate"),
        s"unexpected min_by placement:\n$l")
    }
  }
}
