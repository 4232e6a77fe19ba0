package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the normalizer (reference
  * `/root/reference/vspace/utils/text.py:5-17`: NFC -> lowercase -> `\w+`
  * runs joined by single spaces). */
class TextKernelsSpec extends AnyFunSuite {

  private def samples(g: Gen[String], n: Int = 200): Seq[String] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("golden cases") {
    val cases = Seq(
      "Hello, World!" -> "hello world",
      "  a\t b\nc  " -> "a b c",
      "don't stop" -> "don t stop",
      "foo_bar baz" -> "foo_bar baz", // _ is \w
      "" -> "",
      "!!!" -> "",
      "Num8er5 ok" -> "num8er5 ok",
      "CAFÉ latte" -> "café latte", // NFC combines E + U+0301
      "École" -> "école",
      "tabs\tand more" -> "tabs and more")
    cases.foreach { case (in, out) =>
      assert(TextKernels.normalize(in) == out, s"input: <$in>")
    }
  }

  test("idempotence on random strings") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = TextKernels.normalize(s)
      assert(TextKernels.normalize(once) == once, s"input: <$s>")
    }
  }

  test("output is only word chars and single spaces") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val n = TextKernels.normalize(s)
      assert(!n.startsWith(" ") && !n.endsWith(" ") && !n.contains("  "),
        s"input: <$s> -> <$n>")
    }
  }

  test("rolling hash is deterministic and order-sensitive") {
    assert(TextKernels.rollingHash("abc") == TextKernels.rollingHash("abc"))
    assert(TextKernels.rollingHash("abc") != TextKernels.rollingHash("cba"))
    assert(TextKernels.rollingHash("") == 0L)
  }
}
