package graft

import graft.operators.{AnalyticWindows, Joins, SetOps, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics and plan-shape guarantees for the round-8 widening: the §2.8
  * set-operation family, the Q11/Q22 join shapes, MAD anomaly detection and
  * the corpus card / edit-verify release artifacts. */
class SetOpsSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  test("intersect and except partition the distinct week-1 pair set") {
    val w1Pairs = SetOps.intersectActive(spark, dir)
      .unionByName(SetOps.exceptChurned(spark, dir))
    // intersect(A,B) ⊎ except(A,B) = distinct(A): same cardinality and no
    // pair on both sides
    val both = SetOps.intersectActive(spark, dir)
      .intersect(SetOps.exceptChurned(spark, dir))
    assert(both.count() == 0)
    val w1Distinct = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-08"))
      .select(col("user_id"), col("event_type")).distinct()
    assert(w1Pairs.count() == w1Distinct.count())
    assert(w1Pairs.except(w1Distinct).count() == 0)
  }

  test("exceptAll surplus equals the per-key positive count difference") {
    val surplus = SetOps.exceptAllSurplus(spark, dir)
    val ev = Tables.events(spark, dir)
    def counts(lo: String, hi: String) = ev
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val expected = counts("2024-01-01", "2024-01-08").as("a")
      .join(counts("2024-01-08", "2024-01-15").as("b"),
        Seq("user_id", "event_type"), "left")
      .withColumn("d", col("a.c") - coalesce(col("b.c"), lit(0L)))
      .filter(col("d") > 0)
      .select(col("user_id"), col("event_type"), col("d").as("surplus"))
    assert(surplus.except(expected).count() == 0)
    assert(expected.except(surplus).count() == 0)
  }

  test("union re-ingest repairs every repairable DLQ row and loses no valid row") {
    val out = SetOps.unionReingest(spark, dir).cache()
    try {
      // every re-ingested value is in range (or null), every type canonical
      val re = out.filter(col("origin") === "reingested")
      assert(re.filter(col("value").isNotNull &&
        (col("value") < 0.0 || col("value") > 100.0)).count() == 0)
      assert(re.filter(!col("event_type").rlike("^[a-z]+$")).count() == 0)
      // direct side is exactly the fully-valid rows
      val ev = Tables.events(spark, dir)
      val validCnt = ev.filter(col("value").isNull ||
          (col("value") >= 0.0 && col("value") <= 100.0))
        .filter(col("event_id").isNotNull && col("ts").isNotNull &&
          col("user_id").isNotNull && col("event_type").isNotNull &&
          trim(col("event_type")).rlike("^[a-z]+$") &&
          !lower(trim(col("event_type"))).isin("null", "none", "n/a", ""))
        .count()
      assert(out.filter(col("origin") === "direct").count() == validCnt)
    } finally out.unpersist()
  }

  test("union re-ingest is a narrow plan: no shuffle exchange anywhere") {
    val plan = SetOps.unionReingest(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("MAD anomaly: stats broadcast back, never a window over raw rows") {
    val df = AnalyticWindows.madAnomaly(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("RunningWindow"),
      s"window over raw rows in:\n$plan")
    // three broadcast joins (the mad branch re-derives dev), zero shuffled
    // joins: per-class stats always ride broadcasts
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("MAD anomaly: med/mad bound the data and the rule is outlier-robust") {
    val rows = AnalyticWindows.madAnomaly(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mad, n, anom) = (r.getAs[Double]("mad"), r.getAs[Long]("n"),
        r.getAs[Long]("n_anomalies"))
      assert(mad >= 0.0)
      // the median absolute deviation covers at least half the class by
      // definition, so > 3·MAD can never flag a majority
      assert(anom <= n / 2, s"$anom anomalies of $n in ${r.getAs[String]("event_type")}")
    }
  }

  test("Q11 shape: survivors cover the fraction bound against an independent total") {
    // sf0.01: the smallest fixture has no nation-5 suppliers
    val dir = "/root/testdata/sf0.01"
    val out = Joins.importantParts(spark, dir).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // independent total from the raw tables
      val s = Tables.supplier(spark, dir).filter(col("s_nationkey") === 5)
      val tot = Tables.lineitem(spark, dir)
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(8,0)")).cast("double"))
        .head.getDouble(0)
      rows.foreach { r =>
        assert(r.getAs[Double]("stock_value") > tot / 10000.0 - 0.01)
      }
    } finally out.unpersist()
  }

  test("Q22 shape: every surviving nation group contains only lapsed rich customers") {
    val byNation = Joins.wealthyLapsed(spark, dir).collect()
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select("o_custkey").distinct()
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(operators.Exact.avgD("c_acctbal")).head.getDouble(0)
    val expected = c.filter(col("c_acctbal") > avgBal)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      .collect().map(r => r.getAs[Int]("c_nationkey") -> r.getAs[Long]("n_cust")).toMap
    assert(byNation.map(r => r.getAs[Int]("c_nationkey") -> r.getAs[Long]("n_cust")).toMap
      == expected)
  }

  test("edit-verify: pairs are unordered-unique, distance-0 iff identical prefixes") {
    val out = TextAnalysis.editVerify(spark, "/root/testdata/sf0.01").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("l_doc") >= col("r_doc")).count() == 0)
      assert(out.groupBy("l_doc", "r_doc").count().filter(col("count") > 1)
        .count() == 0)
      // re-derive the prefixes and check the zero-distance law both ways
      val d = Tables.documents(spark, "/root/testdata/sf0.01")
        .select(col("doc_id"), substring(col("text"), 1, 200).as("p"))
      val joined = out
        .join(d.withColumnRenamed("doc_id", "l_doc").withColumnRenamed("p", "lp"), "l_doc")
        .join(d.withColumnRenamed("doc_id", "r_doc").withColumnRenamed("p", "rp"), "r_doc")
      assert(joined.filter((col("edit_dist") === 0) =!= (col("lp") === col("rp")))
        .count() == 0)
    } finally out.unpersist()
  }

  test("Q21 shape: decorrelated form equals the correlated double-EXISTS") {
    val dir = "/root/testdata/sf0.01"
    val out = Joins.waitingSuppliers(spark, dir)
    Seq("lineitem", "orders", "supplier").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    val correlated = spark.sql(
      """WITH l AS (
           SELECT l_orderkey, l_suppkey,
                  l_shipdate > o_orderdate + INTERVAL 120 DAYS AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         SELECT s_suppkey, s_name, count(DISTINCT l1.l_orderkey) AS numwait
         FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
         WHERE l1.late
           AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
         GROUP BY 1, 2""")
    assert(out.except(correlated).count() == 0)
    assert(correlated.except(out).count() == 0)
    assert(out.count() > 0)
  }

  test("CUSUM: each user's final cumulative deviation is exactly zero") {
    // sum(value) − n·mean ≡ 0 by construction: the rounded last row per
    // user must land on 0.0 exactly, or the exact-decimal discipline broke
    val out = AnalyticWindows.cusumShift(spark, dir)
    val lastDev = out
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
    assert(lastDev.count() > 0)
    assert(lastDev.filter(col("cum_dev") =!= 0.0).count() == 0)
  }

  test("dataset card: moments agree with independently computed statistics") {
    val r = TextAnalysis.datasetCard(spark, dir).head
    val d = Tables.documents(spark, dir)
    val n = d.count()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("distinct_texts") <= n)
    val lens = d.select(col("n_chars").cast("double")).collect().map(_.getDouble(0))
    val mean = lens.sum / n
    val std = math.sqrt(lens.map(x => (x - mean) * (x - mean)).sum / n)
    assert(math.abs(r.getAs[Double]("avg_chars") - mean) < 1e-3)
    assert(math.abs(r.getAs[Double]("std_chars") - std) < 1e-3)
    assert(r.getAs[Double]("dup_pct") >= 0.0 && r.getAs[Double]("dup_pct") <= 100.0)
  }
}
