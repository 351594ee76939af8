package graft

// Final-plan probe (round-19 optimization round): the static Explain dump
// shows the INITIAL adaptive plan, but AQE defers exchange reuse to runtime
// (the m6_tfidf PlanContractSpec precedent) — so "is this duplicated subtree
// actually computed twice?" can only be answered from the executed plan.
// Runs each named query through the noop sink and reports ReusedExchange /
// Exchange / scan counts from the FINAL adaptive plan.
//   usage: sbt "runMain graft.ProfFinalPlan <sfDir> <query> [query ...]"
import org.apache.spark.sql.SparkSession

object ProfFinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("j15_waiting_suppliers")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      // collect (not a noop write): a write wraps the plan in its own
      // QueryExecution, leaving THIS one unexecuted — the spec precedent
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val cut = math.max(p.indexOf("== Initial Plan =="), 0)
      val fin = if (cut > 0) p.substring(0, cut) else p
      def n(pat: String) = pat.r.findAllIn(fin).length
      println(s"## $q final=${fin.contains("isFinalPlan=true")} " +
        s"reused=${n("ReusedExchange")} exch=${n("Exchange")} " +
        s"scan=${n("Scan parquet")} smj=${n("SortMergeJoin")} " +
        s"bhj=${n("BroadcastHashJoin")} agg=${n("HashAggregate")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
