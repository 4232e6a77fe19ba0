package graft.functions

import graft.SparkSpec

/** Jaro-Winkler kernel parity: values below are quoted from DuckDB's
  * `jaro_winkler_similarity` / `jaro_similarity` (the oracle engine), so a
  * drift in window, transposition, prefix, or boost-threshold semantics
  * fails here before it can fail the q190 linkage gate.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    TextKernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private val eps = 1e-9

  test("classic pairs match DuckDB jaro_winkler_similarity") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111) < eps)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333) < eps)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962963) < eps)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < eps)
    assert(math.abs(jw("kitten", "sitting") - 0.7460317460) < eps)
    assert(math.abs(jw("crate", "trace") - 0.7333333333) < eps)
    assert(math.abs(jw("information", "informant") - 0.9414141414) < eps)
  }

  test("boost applies only above jaro 0.7, prefix capped at 4") {
    // jaro 0.5833 < 0.7: no boost despite 3-char common prefix
    assert(math.abs(jw("abcdefgh", "abczzzzz") - 0.5833333333) < eps)
    // prefix 2 with boost
    assert(math.abs(jw("ab", "abcdefghijklmnop") - 0.7666666667) < eps)
    // prefix capped at 4 even though 5 chars are shared
    assert(math.abs(jw("aaaaa", "aaaaab") - 0.9666666667) < eps)
    assert(math.abs(jw("pennsylvania", "pencilvaneya") - 0.8314814815) < eps)
  }

  test("edge cases: empties, no matches, zero window") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    // window floor(max/2)-1 = 0: adjacent transposition can't match
    assert(jw("ab", "ba") == 0.0)
    assert(jw("abc", "abc") == 1.0)
  }

  test("SQL surface + codegen: jaro_winkler matches the kernel") {
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS j").head().getDouble(0)
    assert(math.abs(r - 0.9611111111) < eps)
    // codegen path over a column (not constant-folded)
    import spark.implicits._
    val rows = Seq(("martha", "marhta"), ("dixon", "dicksonx"))
      .toDF("a", "b")
      .select(graft.functions.jaro_winkler($"a", $"b").as("j"))
      .collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 0.9611111111) < eps)
    assert(math.abs(rows(1) - 0.8133333333) < eps)
  }

  test("symmetry on random-ish pairs") {
    val pairs = Seq("spark" -> "sprak", "filter" -> "filtre",
      "window" -> "widow", "stream" -> "steamr")
    pairs.foreach { case (a, b) => assert(math.abs(jw(a, b) - jw(b, a)) < eps) }
  }
}
