package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact.{rnd, sqlRnd}

/** The adversarial data-generator fixture + issue statistics (SURVEY.md §2.4
  * A6, §5; reference data_generator/generator.py:176-533, 591-641).
  *
  * The reference injects 7 labeled corruption classes at fixed rates and
  * eyeballs the validator's counters against those rates — its de-facto test
  * strategy. Here the injection is *seedless-deterministic*: the class is a
  * pure function of `event_id mod 100`, with threshold bands matching the
  * reference's documented rates, so both engines (and every rerun) corrupt
  * identical rows. ValidationSpec property-tests the validation split
  * against each class; `a6_issue_stats` is the generator's own issue report
  * (generator.py:591-641).
  *
  * Injection is a narrow map (plus a union for the duplicate class) — no
  * shuffle; the stats query is one hash aggregation over ~9 groups.
  */
object Generator {

  /** (class label, band start, band end) over event_id % 100 — rates from
    * generator.py: nulls 15% (:176), duplicates 5% (:226), late 10% (:258),
    * out-of-range 12% (:295), type mismatch 5% (:355), schema violation 4%
    * (:392), formatting 6% (:429), spikes 8% (:473). */
  val classes: Seq[(String, Int, Int)] = Seq(
    ("null_value", 0, 15),
    ("duplicate", 15, 20),
    ("late_data", 20, 30),
    ("out_of_range", 30, 42),
    ("type_mismatch", 42, 47),
    ("schema_violation", 47, 51),
    ("formatting", 51, 57),
    ("spike", 57, 65))

  private def band: Column = pmod(col("event_id"), lit(100))

  /** The injected class label for a row (null outside every band; the bands
    * are disjoint so fold order is immaterial). */
  def issueType: Column =
    classes.foldLeft(lit(null).cast("string")) { case (acc, (name, lo, hi)) =>
      when(band >= lo && band < hi, lit(name)).otherwise(acc)
    }

  /** Corrupt the events stream: apply each class's mutation to its band and
    * append the duplicated rows (the one class that changes cardinality).
    * Mutations mirror generator.py: null fields (:176-223), exact re-sends
    * (:226-255), 2-hour-late timestamps (:258-292), +1000 range escapes
    * (:295-352), non-JSON payloads (:355-389), case-mangled identifiers
    * (:429-470), 10× spikes (:473-533), dropped identifier (schema
    * violation, :392-426). */
  def withIssues(df: DataFrame): DataFrame = {
    val tagged = df.withColumn("issue_type", coalesce(issueType, lit("clean")))
    val corrupted = tagged
      .withColumn("value",
        when(col("issue_type") === "null_value", lit(null).cast("double"))
          .when(col("issue_type") === "out_of_range", col("value") + 1000)
          .when(col("issue_type") === "spike", col("value") * 10)
          .otherwise(col("value")))
      .withColumn("ts",
        when(col("issue_type") === "late_data", col("ts") - expr("INTERVAL 2 HOURS"))
          .otherwise(col("ts")))
      .withColumn("props",
        when(col("issue_type") === "type_mismatch", lit("not json"))
          .otherwise(col("props")))
      .withColumn("event_type",
        when(col("issue_type") === "formatting", upper(col("event_type")))
          .when(col("issue_type") === "schema_violation", lit(null).cast("string"))
          .otherwise(col("event_type")))
    corrupted.unionAll(corrupted.filter(col("issue_type") === "duplicate"))
  }

  /** A6: generator issue statistics — count + share per injected class
    * (generator.py:591-641), over the corrupted stream (duplicates counted
    * twice, as the reference's producer re-send does). */
  def issueStats(spark: SparkSession, dir: String): DataFrame =
    Exact.withSharePct(
      withIssues(Tables.events(spark, dir))
        .groupBy(col("issue_type")).agg(count(lit(1)).as("cnt")),
      "cnt", "pct")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a6_issue_stats" -> issueStats)

  private val issueSql =
    classes.reverse.map { case (name, lo, hi) =>
      s"WHEN event_id % 100 >= $lo AND event_id % 100 < $hi THEN '$name'"
    }.mkString("CASE ", " ", " ELSE 'clean' END")

  val oracles: Map[String, String] = Map(
    "a6_issue_stats" ->
      s"""WITH tagged AS (SELECT $issueSql AS issue_type FROM events),
          doubled AS (SELECT issue_type FROM tagged
                      UNION ALL
                      SELECT issue_type FROM tagged WHERE issue_type = 'duplicate'),
          counts AS (SELECT issue_type, count(*) AS cnt FROM doubled GROUP BY 1)
          SELECT issue_type, cnt,
            ${sqlRnd("cnt * 100.0 / sum(cnt) OVER ()", 4)} AS pct
          FROM counts""")
}
