package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** JVM-side text kernels shared by the Catalyst expressions and typed code.
  *
  * Semantics follow the reference normalizer (`/root/reference/vspace/utils/text.py:5-17`):
  * Unicode NFC normalize, lowercase, extract `\w+` runs, re-join with single
  * spaces. The reference runs Python 3 `re`, whose `\w` is Unicode-aware, so
  * we compile with UNICODE_CHARACTER_CLASS for parity.
  *
  * These are plain static methods (object = static forwarders) so generated
  * whole-stage code can call them directly without holding object refs.
  */
object TextKernels {
  private val WordRun: Pattern = Pattern.compile("\\w+", Pattern.UNICODE_CHARACTER_CLASS)

  def normalize(s: String): String = {
    val nfc   = Normalizer.normalize(s, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(Locale.ROOT)
    val m     = WordRun.matcher(lower)
    val sb    = new java.lang.StringBuilder(lower.length)
    var first = true
    while (m.find()) {
      if (!first) sb.append(' ')
      sb.append(m.group())
      first = false
    }
    sb.toString
  }

  def normalizeUtf8(u: UTF8String): UTF8String =
    UTF8String.fromString(normalize(u.toString))

  /** Polynomial hash (Rabin-Karp style) of a string over the 2^64 ring
    * (Java long wraparound is defined, so this is deterministic across JVMs).
    * Used by the winnowing fingerprinter.
    */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = h * 1000003L + s.charAt(i).toLong
      i += 1
    }
    h
  }

  /** Shannon entropy (nats) of the CODEPOINT distribution of a string — the
    * character-diversity quality signal (low entropy flags boilerplate,
    * repeated-char junk, and single-script spam). One pass over codepoints,
    * a codepoint->count map, then H = -sum (k/n) ln (k/n); counted over
    * codepoints (not UTF-16 units) to match `len`/char semantics in
    * standard SQL engines. Empty string -> 0.0.
    */
  def charEntropy(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  /** Space-delimited token count WITHOUT materializing the split array:
    * exactly `size(split(s, " ", -1))` = (number of 0x20 bytes) + 1 — a
    * 0x20 byte never occurs inside a UTF-8 multi-byte sequence, so a raw
    * byte scan is codepoint-correct. Matches Java regex-split semantics
    * for the single-space pattern: empties between/before/after spaces
    * all count (limit -1 keeps trailing empties). */
  def tokenCount(u: UTF8String): Int = {
    val n = u.numBytes()
    var i = 0
    var c = 1
    while (i < n) {
      if (u.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }
}
