package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan of a registered query — the dev loop for checking
  * pushdown, broadcast, and codegen span before trusting a bench number. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.bootstrap(spark)
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
