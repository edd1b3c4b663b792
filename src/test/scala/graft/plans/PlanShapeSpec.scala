package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Mechanical plan-shape pins for the headline keys (r14 verdict item
  * #4): the scale-critical plan properties previously audited only in
  * PLANS.md prose — broadcast dims, no cartesian products, the
  * WindowGroupLimit stratified-sample shape — asserted against the
  * EXECUTED (post-AQE) physical plan at sf0.001, so a regression (a
  * lost broadcast hint, a new exchange, a join-order flip into a
  * cartesian) fails the suite instead of surfacing as bench drift.
  *
  * The other two shapes the verdict names are already mechanically
  * pinned where their machinery lives: SPJ's zero-Exchange graft⋈graft
  * join in SpjSpec (ShuffleExchange count == 0) and w07's
  * DynamicPruningExpression on the MERGE target scan in
  * DeltaRuntimeFilterSpec (`planStr.contains("dynamicpruning")`).
  *
  * The de-optimized negative control proves the detector discriminates:
  * the same join rebuilt WITHOUT hints under broadcast thresholds -1
  * must show SortMergeJoin and no BroadcastHashJoin.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Execute, then render the FINAL (post-AQE) physical plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect(): Unit
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def count(plan: String, node: String): Int =
    plan.sliding(node.length).count(_ == node)

  /** Run `body` with auto-broadcast disabled (threshold -1, both the
    * static and the AQE knob). Explicit `broadcast()` hints still
    * broadcast — so under this conf the plan looks like the 100 TB
    * plan: hinted dims broadcast, everything unhinted must shuffle.
    * Without it, AQE auto-broadcasts every join at sf0.001 and the
    * shuffle-join asserts would be vacuous.
    */
  private def withAutoBroadcastOff[A](body: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try { keys.foreach(conf.set(_, "-1")); body }
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q05 orders fact: geo dims broadcast, no cartesian product") {
    val plan = finalPlan(SparkEntry.queries("q05_orders_fact")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"q05 lost its broadcast dim joins:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q05 plans a cartesian product:\n$plan")
  }

  test("q18 region revenue: supplier/nation/region broadcast, no cartesian product") {
    val plan = finalPlan(SparkEntry.queries("q18_region_revenue")(spark, sf))
    assert(count(plan, "BroadcastHashJoin") >= 3,
      s"q18 must broadcast supplier+nation+region " +
        s"(found ${count(plan, "BroadcastHashJoin")}):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q18 plans a cartesian product:\n$plan")
  }

  test("t11 stratified sample: per-stratum top-k plans WindowGroupLimit, not a full sort") {
    val plan = finalPlan(SparkEntry.queries("t11_stratified_sample")(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"t11 lost the WindowGroupLimit push-down (full window sort per " +
        s"stratum at 100 TB):\n$plan")
  }

  test("q06 order-item fact: ONE shuffle join (fact⋈fact), hinted dims stay broadcast at scale") {
    // Under auto-broadcast-off the plan is the 100 TB plan: orders
    // (unhinted — it never fits an executor at scale) shuffles against
    // lineitem EXACTLY ONCE; part + supplier keep their explicit
    // broadcast() hints. More than one shuffle join means a dim lost
    // its hint — at 1000 executors that's two extra full-table
    // exchanges of the largest table.
    withAutoBroadcastOff {
      val plan = finalPlan(SparkEntry.queries("q06_order_item_fact")(spark, sf))
      val shuffleJoins = count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin")
      assert(shuffleJoins == 1,
        s"q06 must shuffle-join ONLY lineitem⋈orders (found $shuffleJoins):\n$plan")
      assert(count(plan, "BroadcastHashJoin") >= 2,
        s"q06 lost a dim broadcast hint (part/supplier):\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"q06 plans a cartesian product:\n$plan")
    }
  }

  test("q21 market basket: ONE scan, ONE basket shuffle, no join, distributed top-k") {
    // r19 shape (guide §2.3/§2.4): baskets are collected per order in
    // ONE shuffle and pairs are generated inside the reducer — the
    // former self-join (two lineitem subtrees + a join) is gone. The
    // plan must (a) scan lineitem exactly once; (b) contain NO join of
    // any kind; (c) keep the final top-25 a distributed
    // TakeOrderedAndProject — a global Sort of all pairs is the 100 TB
    // killer.
    withAutoBroadcastOff {
      val plan = finalPlan(SparkEntry.queries("q21_market_basket")(spark, sf))
      assert(plan.contains("TakeOrderedAndProject"),
        s"q21 lost the distributed top-k (global sort over all pairs at " +
          s"100 TB):\n$plan")
      assert(count(plan, "Scan parquet") == 1,
        s"q21 must scan lineitem exactly once:\n$plan")
      assert(count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin") +
        count(plan, "BroadcastHashJoin") == 0,
        s"q21 reintroduced a join (the basket form needs none):\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"q21 degraded to a cartesian/BNLJ:\n$plan")
    }
  }

  test("negative control: the de-optimized twin is detected (no broadcast under threshold -1, no hints)") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      // q18's join chain, hint-free: with broadcasts disabled this MUST
      // de-optimize to shuffle joins — proving the positive asserts
      // above cannot pass vacuously
      val deopt = Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(sum(col("o_totalprice")).as("rev"))
      val plan = finalPlan(deopt)
      assert(!plan.contains("BroadcastHashJoin"),
        s"negative control still broadcasts — the detector cannot " +
          s"discriminate:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"negative control lost its joins entirely:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
