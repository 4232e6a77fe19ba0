package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Char-entropy kernel + expression: known closed-form values, codepoint
  * (not UTF-16) counting, and the codegen'd Column path agreeing with the
  * kernel. */
class CharEntropySpec extends SparkSpec {

  private def h(s: String): Double =
    TextKernels.charEntropy(UTF8String.fromString(s))

  test("closed-form values") {
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0)
    assert(math.abs(h("abcd") - math.log(4)) < 1e-12) // uniform over 4
    assert(math.abs(h("aab") - (-(2.0 / 3) * math.log(2.0 / 3)
      - (1.0 / 3) * math.log(1.0 / 3))) < 1e-12)
    // order-invariant
    assert(h("abab") == h("aabb"))
  }

  test("counts codepoints, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16; 4 distinct codepoints, uniform
    val s = "aé中" + new String(Character.toChars(0x1F600))
    assert(math.abs(h(s) - math.log(4)) < 1e-12)
  }

  test("codegen'd Column agrees with the kernel") {
    import spark.implicits._
    val rows = Seq("", "aaaa", "abcd", "the quick brown fox", "aabbaabb")
    val got = rows.toDF("text")
      .select(char_entropy(col("text")).as("h"))
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case (s, g) =>
      assert(math.abs(g - h(s)) < 1e-15, s"input: <$s>")
    }
  }
}
