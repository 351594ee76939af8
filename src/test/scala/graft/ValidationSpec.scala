package graft

import graft.operators.{Generator, Validation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests of the validation split against the seeded corruption
  * generator (SURVEY.md §5 — the reference's de-facto test strategy: inject
  * labeled corruption classes, check the validator catches each one;
  * generator.py:176-533 × validation_consumer.py:412-444). */
class ValidationSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  /** Corrupted stream + the stricter rule set the corrupted stream needs
    * (the clean fixture has no null values, so the base rule set omits
    * value-presence; the generator reintroduces the reference's
    * REQUIRED_FIELD value). */
  private lazy val corrupted: DataFrame =
    Generator.withIssues(Tables.events(spark, dir)).cache()
  private lazy val rules =
    Validation.eventRules :+ Validation.presenceRule("value")

  private lazy val (valid, dlq) = Validation.split(corrupted, rules)

  test("split is a partition: valid and dlq are disjoint and cover the input") {
    val n = corrupted.count()
    assert(valid.count() + dlq.count() == n)
    // disjoint by event_id occurrence count (ids repeat only via the
    // duplicate class, which lands wholly on one side per copy)
    val both = valid.select("event_id").intersect(dlq.select("event_id")).count()
    assert(both == 0)
  }

  test("every guaranteed-failing corruption class lands in the DLQ") {
    // null_value -> presence_value; out_of_range -> +1000 escapes [0,100];
    // formatting -> upper() breaks ^[a-z]+$; schema_violation -> null
    // event_type fails completeness
    for (cls <- Seq("null_value", "out_of_range", "formatting", "schema_violation")) {
      val leaked = valid.filter(col("issue_type") === cls).count()
      assert(leaked == 0, s"$cls rows leaked into the valid branch")
    }
  }

  test("failure reasons name the rule that fired") {
    val reasons = dlq.filter(col("issue_type") === "out_of_range")
      .select("validation_failures").distinct().collect().map(_.getString(0))
    assert(reasons.nonEmpty)
    assert(reasons.forall(_.contains("Out of range: value")))
    val fmt = dlq.filter(col("issue_type") === "formatting")
      .select("validation_failures").distinct().collect().map(_.getString(0))
    assert(fmt.forall(_.contains("Invalid format: event_type")))
  }

  test("late_data and duplicate corruption does not change the batch verdict") {
    // late/duplicate corruption violates no batch rule (the watermark —
    // StreamingSpec — and the dedup operators v7/m4b/m4c own those classes);
    // a row in these bands is DLQ'd iff its *uncorrupted* form already was
    val baseline = Validation.withFailures(Tables.events(spark, dir), rules)
      .select(col("event_id"), col("data_quality_flag").as("base_flag"))
    val flagged = Validation.withFailures(corrupted, rules)
      .filter(col("issue_type").isin("late_data", "duplicate"))
      .select(col("event_id"), col("issue_type"), col("data_quality_flag"))
    val changed = flagged.join(baseline, "event_id")
      .filter(col("data_quality_flag") =!= col("base_flag")).count()
    assert(changed == 0, "late/duplicate corruption flipped a validation verdict")
  }

  test("injection rates match the generator's declared bands") {
    val base = Tables.events(spark, dir).count().toDouble
    val byClass = corrupted.groupBy("issue_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((name, lo, hi) <- Generator.classes) {
      val expectedShare = (hi - lo) / 100.0 * (if (name == "duplicate") 2 else 1)
      val actual = byClass.getOrElse(name, 0L) / base
      assert(math.abs(actual - expectedShare) < 0.02,
        s"$name: got $actual, want ~$expectedShare")
    }
  }

  test("closed-schema check routes every corrupted-key band to the DLQ, nothing else") {
    val out = Validation.closedSchemaCheck(spark, dir).cache()
    val band = pmod(col("event_id"), lit(100))
    // bands 47-50 carry injected key corruption → all invalid
    assert(out.filter(band.isin(47, 48, 49, 50) &&
      col("data_quality_flag") === "valid").count() == 0)
    // every other gated row has exactly the whitelisted keys → all valid
    assert(out.filter(!band.isin(47, 48, 49, 50) &&
      col("data_quality_flag") === "invalid").count() == 0)
    // extra-key rows name the unexpected field (validation_consumer.py:155)
    val extra = out.filter(band === 49).collect()
    assert(extra.nonEmpty)
    assert(extra.forall(_.getAs[String]("validation_failures")
      .contains("Unexpected fields: unexpected_field")))
    // the typo band is both a missing required key and an unexpected key
    val typo = out.filter(band === 50).collect()
    assert(typo.nonEmpty)
    assert(typo.forall(r => r.getAs[String]("unexpected_keys") == "vaue" &&
      r.getAs[String]("missing_keys") == "value"))
    out.unpersist()
  }

  test("issue stats are deterministic across reruns") {
    val a = Generator.issueStats(spark, dir).orderBy("issue_type").collect()
    val b = Generator.issueStats(spark, dir).orderBy("issue_type").collect()
    assert(a.sameElements(b))
  }
}
