package graft

/** Plan-shape regression guards: the load-bearing operators must keep
  * the physical shapes the scale design depends on — interval
  * strategies plan as broadcast index probes, and nothing in the
  * genomic/interval family ever degenerates to a nested-loop or
  * cartesian join (the ANN crossJoins are the one documented
  * broadcast-small exception, excluded here). Planning only — no jobs
  * run. */
class PlanSuite extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("interval operators plan as index probes, never nested loops") {
    // whole-operator joins MUST plan through the custom exec node
    Seq("f1_overlap_join", "j1_sql_rewrite").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastIntervalJoin"),
        s"$q lost the strategy plan:\n${p.take(2000)}")
    }
    // probe-expression operators: any shape but never a nested loop
    Seq("f1_overlap_join", "f2_count_overlaps", "f4_nearest_k1",
        "f8_subtract", "j1_sql_rewrite").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n${p.take(2000)}")
    }
  }

  test("the integrated annotate pipeline contains no nested-loop joins") {
    Seq("f11_annotate_e2e", "f11_colocated", "f10_lookup_variants").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n${p.take(2000)}")
    }
  }
}
