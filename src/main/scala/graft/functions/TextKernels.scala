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

  /** One-pass exact set Jaccard over two string arrays — the kernel behind
    * [[graft.functions.SetJaccard]]; semantics identical to
    * `size(array_intersect(a, b)) / size(array_union(a, b))` under default
    * (non-ANSI) SQL, including null-element dedup and the both-empty case:
    * 0/0 divides to NULL, and NULL is what this returns (boxed). An earlier
    * revision returned NaN there — dangerous on the SQL surface, because
    * Spark orders NaN GREATER than every number, so `jac >= threshold`
    * would silently ADMIT a both-empty pair that every built-in
    * formulation rejects. */
  def setJaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val na = a.numElements()
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      Math.max(8, na * 2))
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val nb = b.numElements()
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      Math.max(8, nb * 2))
    var bHasNull = false
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val s = b.getUTF8String(i)
        if (seenB.add(s)) {
          if (setA.contains(s)) inter += 1 else bOnly += 1
        }
      }
      i += 1
    }
    if (aHasNull && bHasNull) inter += 1
    val sizeA = setA.size() + (if (aHasNull) 1 else 0)
    val sizeBOnly = bOnly + (if (bHasNull && !aHasNull) 1 else 0)
    val union = sizeA + sizeBOnly
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  /** [[setJaccard]]'s array<long> twin, for shingle sets that travel as
    * 8-byte hashes instead of strings (the pipeline verify stage: hashed
    * shingle arrays are ~4-5x smaller through the candidate regroup
    * shuffle, and at the 23 GB scale point the string-array spill was the
    * volume's ENOSPC). Same set semantics: duplicate and null elements
    * deduplicate, both-empty returns NULL. Sort-merge instead of hash
    * sets: two primitive sorts + one two-pointer pass, no boxing, no
    * sentinel bookkeeping. */
  def setJaccardLongs(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    var aHasNull = false
    var bHasNull = false
    val na = a.numElements()
    val va = new Array[Long](na)
    var la = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else { va(la) = a.getLong(i); la += 1 }
      i += 1
    }
    val nb = b.numElements()
    val vb = new Array[Long](nb)
    var lb = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else { vb(lb) = b.getLong(i); lb += 1 }
      i += 1
    }
    mergeJaccardLongs(va, la, vb, lb, aHasNull, bHasNull)
  }

  /** [[setJaccardLongs]] for arrays whose SCHEMA says containsNull=false
    * (the [[graft.functions.SetJaccardHashes]] expression dispatches here
    * at bind time): skips the per-element null branch and bulk-copies via
    * `ArrayData.toLongArray` (a single `Platform.copyMemory` for
    * UnsafeArrayData, which is what shuffled rows arrive as). Same result
    * as the general form on null-free input — duplicate elements still
    * deduplicate in the merge. */
  def setJaccardLongsNoNulls(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val va = a.toLongArray()
    val vb = b.toLongArray()
    mergeJaccardLongs(va, va.length, vb, vb.length, aHasNull = false,
      bHasNull = false)
  }

  /** Shared tail of the long-set Jaccard kernels: sort both prefixes in
    * place, two-pointer merge with duplicate skip, null-sentinel fold. */
  private def mergeJaccardLongs(va: Array[Long], la: Int, vb: Array[Long],
      lb: Int, aHasNull: Boolean, bHasNull: Boolean): java.lang.Double = {
    java.util.Arrays.sort(va, 0, la)
    java.util.Arrays.sort(vb, 0, lb)
    var ia = 0
    var ib = 0
    var inter = 0
    var aOnly = 0
    var bOnly = 0
    while (ia < la && ib < lb) {
      val x = va(ia); val y = vb(ib)
      if (x == y) { inter += 1; while (ia < la && va(ia) == x) ia += 1; while (ib < lb && vb(ib) == y) ib += 1 }
      else if (x < y) { aOnly += 1; while (ia < la && va(ia) == x) ia += 1 }
      else { bOnly += 1; while (ib < lb && vb(ib) == y) ib += 1 }
    }
    while (ia < la) { aOnly += 1; val x = va(ia); while (ia < la && va(ia) == x) ia += 1 }
    while (ib < lb) { bOnly += 1; val y = vb(ib); while (ib < lb && vb(ib) == y) ib += 1 }
    if (aHasNull && bHasNull) inter += 1
    else if (aHasNull) aOnly += 1
    else if (bHasNull) bOnly += 1
    val union = inter + aOnly + bOnly
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

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

  /** Jaro-Winkler similarity, standard Winkler parameterisation (prefix
    * scale 0.1, prefix cap 4, boost only when jaro > 0.7) with the common
    * conventions used by SQL engines (match window `max(|a|,|b|)/2 - 1`
    * floored at 0; either side empty -> 0.0). Record-linkage kernel for
    * the blocked fuzzy-match join; two stack-local boolean arrays, no
    * allocation beyond them, char-indexed (synthetic corpus is ASCII so
    * char vs codepoint indexing cannot diverge).
    */
  def jaroWinkler(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString
    val b = bu.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    // transpositions = FLOOR of half the out-of-order matches (the
    // RapidFuzz/DuckDB convention — an odd raw count rounds down, unlike
    // the fractional t/2 some references use; pinned by the
    // pennsylvania/pencilvaneya case in JaroWinklerSpec)
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
