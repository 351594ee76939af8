package graft

import graft.operators.Joins
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantees for the join family (the part the value-comparing
  * oracle cannot see). */
class JoinsSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans a sort-merge join with no shuffle exchange") {
    val df = Joins.bucketedJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    // the join inputs are bucket-aligned: the only exchange allowed in the
    // whole plan is the post-join aggregation shuffle, which hashes on the
    // group key, not the join key
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(_.contains("o_orderpriority")),
      s"join-side shuffle found:\n${exchanges.mkString("\n")}")
    assert(df.count() > 0)
  }

  test("broadcast join plans a broadcast hash join on the dimension side") {
    val plan = Joins.broadcastJoin(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("as-of semantics at the boundaries: inclusive close, no-history nulls") {
    val out = Joins.asofJoin(spark, dir).cache()
    try {
      // an event landing exactly AT an hour's close gets that hour (<= bound)
      val atClose = out.filter(col("ts") === col("asof_close"))
      atClose.collect().foreach { r =>
        assert(r.getAs[java.sql.Timestamp]("asof_close") != null)
      }
      // events before any completed hour carry nulls, not dropped rows
      // (left-join semantics): each sensor's earliest event predates its
      // first hour close by construction
      val noHistory = out.filter(col("asof_close").isNull)
      assert(noHistory.count() > 0)
      // and whenever a close is attached, the avg from that hour came along
      assert(out.filter(col("asof_close").isNotNull && col("asof_avg").isNull)
        .count() == 0)
    } finally out.unpersist()
  }

  test("range join plans an equi hash join on the grid, never a nested-loop scan") {
    val df = Joins.rangeJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate leaked into a nested-loop join:\n$plan")
    // candidates meet on the grid: the join itself is an equi-join
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    // sessions partition a sensor's events: exactly one interval per event
    val events = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull).count()
    assert(df.count() == events)
  }

  test("as-of join plans no join operator at all — one key shuffle, one window pass") {
    val df = Joins.asofJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the whole point of the union+window composition: no range join, no
    // cartesian/broadcast-nested-loop explosion
    assert(!plan.contains("Join"), s"unexpected join operator in:\n$plan")
    assert(plan.contains("Window"), "expected the ordered window pass")
    // every exchange hashes on the as-of key (user_id) — events and
    // aggregates co-shuffle once and never again
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("user_id")),
      s"non-key exchange found:\n${exchanges.mkString("\n")}")
    assert(df.count() > 0)
  }
}
