package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-shape regression tests: the properties that decide whether a query
 * survives a 100 TB scale-up — scan pruning/pushdown, broadcast joins on
 * small dimensions, top-k without a global sort, partial aggregation, and
 * no accidental cartesian products. These assert on the optimized/physical
 * plan, so a refactor that silently loses a pushdown fails CI, not the
 * cluster.
 */
class PlanSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    Queries.all.find(_.name == name).get.run(spark, sfDir)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q2: filters reach the parquet scan and columns are pruned") {
    val p = plan(q("q2_filter_project"))
    p should include("PushedFilters")
    // shipdate + discount + returnflag predicates all pushed
    p.toLowerCase should include("l_shipdate")
    p.toLowerCase should include("l_discount")
    // projection pruning: the 16-column lineitem scan reads only the 6
    // referenced columns (ReadSchema lists them, not the full table)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    readSchema should include("l_orderkey")
    (readSchema should not).include("l_comment")
    (readSchema should not).include("l_partkey")
  }

  test("q5: star join broadcasts both dimensions, no shuffle join, no cartesian") {
    val p = plan(q("q5_star_join_agg"))
    p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") should be >= 2
    (p should not).include("SortMergeJoin")
    (p should not).include("CartesianProduct")
  }

  test("q13: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(q("q13_topk"))
    p should include("TakeOrderedAndProject")
  }

  test("d1: exact dedup aggregates partially before the shuffle") {
    // assert on the plan TREE only (formatted mode repeats each node name
    // in the per-node detail section below the tree)
    val tree = plan(q("d1_dedup_exact")).linesIterator
      .takeWhile(_.trim.nonEmpty).mkString("\n")
    // partial + final HashAggregate pair around a single exchange
    tree.sliding("HashAggregate".length).count(_ == "HashAggregate") shouldBe 2
    tree.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
  }

  test("q25: bucketed as-of join is an equi-join (no cartesian/NL join on data)") {
    val p = plan(q("q25_asof_bucketed"))
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("q1: aggregation runs inside whole-stage codegen") {
    // under AQE codegen stages exist only after execution; plan with AQE
    // off to inspect the compiled subtree count deterministically
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = q("q1_pricing_summary").queryExecution
        .explainString(ExplainMode.fromString("codegen"))
      p should fullyMatch regex ("(?s).*Found [1-9]\\d* WholeStageCodegen subtrees.*")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
