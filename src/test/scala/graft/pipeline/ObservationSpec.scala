package graft.pipeline

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-flight pipeline metrics via `Dataset.observe`: row counts and
  * quality tallies collected DURING the action from the existing pass —
  * the operational telemetry a 100 TB job wants (how many rows survived
  * the filter? how many bytes scanned per source?) without the second
  * scan a separate `.count()` costs. The observed values must equal an
  * independent recount. */
class ObservationSpec extends SparkSpec {

  test("observed metrics match a recount without a second scan") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val obs = Observation("ingest")
    val filtered = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(length(col("text"))).as("chars_in"),
        // DISTINCT aggregates are rejected in observed metrics (they'd
        // force a shuffle inside the pass); the sketch form is the
        // supported spelling — and exact at sources-level cardinality
        approx_count_distinct(col("source")).as("n_sources"))
      .filter(col("n_chars") >= 200)
    val kept = filtered.count()

    val m = obs.get
    assert(m("rows_in") == docs.count())
    assert(m("chars_in") == docs.agg(sum(length(col("text"))))
      .collect()(0).getLong(0))
    val exactSources = docs.select("source").distinct().count()
    val approx = m("n_sources").asInstanceOf[Long]
    assert(math.abs(approx - exactSources) <= math.max(1L,
      (exactSources * 0.05).toLong),
      s"approx=$approx exact=$exactSources")
    assert(kept > 0 && kept < m("rows_in").asInstanceOf[Long])
  }
}
