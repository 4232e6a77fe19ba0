package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the gap boundary q141's DuckDB oracle encodes. Spark's
  * session_window merges a successor that lands up to and INCLUDING
  * exactly `gap` after the previous event (closed boundary — verified
  * here, not assumed from the [start, end) window-interval notation), so
  * a new session starts only when the inter-event gap is STRICTLY greater
  * than the gap duration. The oracle's `diff > 1800 ⇒ new session` marker
  * must match that edge exactly or every boundary event lands in the
  * wrong session. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def sessions(gapSecs: Seq[Long]): Long = {
    val t0 = 1700000000L
    val ts = gapSecs.scanLeft(t0)(_ + _)
    ts.map(t => (1L, new java.sql.Timestamp(t * 1000)))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .count()
  }

  test("gap of exactly 30 min still extends the session (closed boundary)") {
    assert(sessions(Seq(1800L)) === 1L)
  }

  test("gap of 30 min plus one second starts a new session") {
    assert(sessions(Seq(1801L)) === 2L)
  }

  test("mixed gaps: sessions split only at > gap boundaries") {
    // gaps 10s, 1800s, 1799s, 3601s -> only the last one splits
    assert(sessions(Seq(10L, 1800L, 1799L, 3601L)) === 2L)
  }
}
