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

  test("m7: delete anti-join is exchange-free (bucketed SMJ, no broadcast)") {
    // r8 verdict: the delete set is ~1/7 of ALL memory keys — a forced
    // broadcast build is a 100 TB OOM. Both sides read the same table
    // bucketed by memory_key, so the anti-join must plan as a sort-merge
    // join with NO exchange on either input (the only allowed Exchange is
    // the final output orderBy's rangepartitioning).
    val plan = graft.memory.MemoryOps.m7DeleteKeys(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
      s"expected a sort-merge LeftAnti join:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"m7 must not broadcast the corpus-proportional delete set:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed anti-join must not shuffle either side:\n$plan")
  }

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
