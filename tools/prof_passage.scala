// scratch: profile m6_passage_scrub's CPU exponent at the 100x probe
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --driver-class-path target/scala-2.13/classes -i tools/prof_passage.scala
// Runs the full query TWICE per scale (first run pays codegen/JIT; the
// second is the steady-state number the scale ratio should be read from),
// then dumps every executed-plan operator metric that speaks to the
// superlinear-CPU suspects: hash-agg spill / sort fallback (n log n term),
// aggregation time, sort time, GC.
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import graft._

spark.conf.set("spark.sql.shuffle.partitions", "32")
Tables.bootstrap(spark)
val osb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  .asInstanceOf[com.sun.management.OperatingSystemMXBean]

def gcMs: Long = {
  import scala.jdk.CollectionConverters._
  java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    .map(_.getCollectionTime).sum
}

def dumpMetrics(p: SparkPlan): Unit = p.foreach {
  case a: AdaptiveSparkPlanExec => dumpMetrics(a.executedPlan)
  case s: QueryStageExec => dumpMetrics(s.plan)
  case r: ReusedExchangeExec => dumpMetrics(r.child)
  case op =>
    val interesting = op.metrics.filter { case (k, m) =>
      (k.toLowerCase.contains("spill") || k.contains("FallBacked") ||
        k.toLowerCase.contains("sort") || k.toLowerCase.contains("agg") ||
        k == "numOutputRows") && m.value > 0
    }
    if (interesting.nonEmpty)
      println(s"   ${op.nodeName}: " + interesting.map { case (k, m) =>
        s"${m.name.getOrElse(k)}=${m.value}" }.mkString(", "))
}

def once(label: String, dir: String, dump: Boolean): Unit = {
  val df = graft.operators.TextAnalysis.passageScrub(spark, dir)
  val qe = df.queryExecution
  val (w0, c0, g0) = (System.nanoTime(), osb.getProcessCpuTime, gcMs)
  val n = qe.toRdd.count()
  val (wall, cpu, gc) =
    ((System.nanoTime() - w0) / 1e9, (osb.getProcessCpuTime - c0) / 1e9, gcMs - g0)
  println(f"## $label rows=$n wall=$wall%.2f s cpu=$cpu%.1f s gc=${gc / 1000.0}%.1f s")
  if (dump) dumpMetrics(qe.executedPlan)
}

once("sf0.1 run1 (cold)", "/root/testdata/sf0.1", dump = false)
once("sf0.1 run2 (warm)", "/root/testdata/sf0.1", dump = true)
once("sf10 run1", "/tmp/graft-sf10", dump = false)
once("sf10 run2 (warm)", "/tmp/graft-sf10", dump = true)
System.exit(0)
