package graft.queries

/** DuckDB SQL generator reproducing Spark's `xxhash64` — the public XXH64
  * algorithm (Collet; also `org.apache.spark.sql.catalyst.expressions.XXH64`)
  * — in HUGEINT arithmetic, so hash-dependent queries (q34 SimHash, and the
  * hand-inlined long variant in q105) can be cross-engine oracled instead of
  * rows-only. Techniques:
  *
  *  - all state lives in [0, 2^64) as HUGEINT; every multiply-accumulate is
  *    taken mod 2^64 explicitly (DuckDB UBIGINT arithmetic ERRORS on
  *    overflow rather than wrapping);
  *  - a 64x64-bit product can reach 2^128, which overflows HUGEINT too, so
  *    multiplication is split at 2^32: lo64(a*b) = (a0*b0 + 2^32*(a1*b0 +
  *    a0*b1)) mod 2^64 (the a1*b1 term is ≡ 0);
  *  - rotations are mul/div by powers of two; xor is native;
  *  - each algorithm step is its OWN chained CTE — DuckDB substitutes
  *    lateral column aliases textually, so nesting the steps in one SELECT
  *    explodes exponentially (measured: un-plannable at 8 steps);
  *  - string input is decoded as `unicode(ch)` per character, which equals
  *    the UTF-8 byte for ASCII corpora only (same BMP caveat as the q53
  *    rolling-hash oracle), and the generated chain covers inputs of at
  *    most 8 bytes (one optional 8-byte lane, one optional 4-byte lane, up
  *    to 3 tail bytes — the corpus' whitespace tokens are <= 8 bytes; a
  *    longer token would hash wrong and FAIL the gate loudly, not pass
  *    silently).
  */
private[queries] object XxhSql {
  private val M  = "18446744073709551616::HUGEINT" // 2^64
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  private def lit(v: BigInt): String = s"$v::HUGEINT"

  /** lo64(a*b) with the 2^32 split (see scaladoc). */
  private def mm(a: String, b: String): String =
    s"((($a)%4294967296)*(($b)%4294967296)" +
      s"+((($a)//4294967296)*(($b)%4294967296)" +
      s"+(($a)%4294967296)*(($b)//4294967296))*4294967296)%$M"

  private def rotl(x: String, r: Int): String =
    s"((($x)*${BigInt(1) << r}+($x)//${BigInt(1) << (64 - r)})%$M)"

  /** Chained CTEs computing the XXH64 (seed 7) of a <=8-byte string: input
    * relation `b` must provide (t, bs, n) — token, per-char codepoint list
    * as HUGEINT, byte length. Returns (cteSql, finalCteName); the final CTE
    * exposes `f5` (unsigned hash) alongside the input columns. */
  def tokenHashCtes(seed: Long = 7L): (String, String) = {
    val w8 = (0 until 8).map(i => s"bs[${i + 1}]*${BigInt(256).pow(i)}").mkString("+")
    val w4 = (0 until 4).map(i => s"bs[${i + 1}]*${BigInt(256).pow(i)}").mkString("+")
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    steps += ((s"($seed+${lit(P5)}+n)%$M", "h0"))
    steps += ((s"CASE WHEN n=8 THEN $w8 ELSE NULL END", "w8"))
    steps += ((s"CASE WHEN n<8 AND n>=4 THEN $w4 ELSE NULL END", "w4"))
    steps += (("CASE WHEN n=8 THEN [] WHEN n>=4 THEN bs[5:] ELSE bs END", "tl"))
    steps += ((s"CASE WHEN w8 IS NULL THEN NULL ELSE ${mm(rotl(mm("w8", lit(P2)), 31), lit(P1))} END", "wk"))
    steps += ((s"CASE WHEN wk IS NULL THEN h0 ELSE (${mm(rotl("xor(h0,wk)", 27), lit(P1))}+${lit(P4)})%$M END", "h1"))
    steps += ((s"CASE WHEN w4 IS NULL THEN h1 ELSE (${mm(rotl("xor(h1," + mm("w4", lit(P1)) + ")", 23), lit(P2))}+${lit(P3)})%$M END", "h2"))
    var prev = "h2"
    (0 until 3).foreach { j =>
      val e = mm(rotl(s"xor($prev,(tl[${j + 1}]*${lit(P5)})%$M)", 11), lit(P1))
      steps += ((s"CASE WHEN len(tl)>$j THEN $e ELSE $prev END", s"h3_$j"))
      prev = s"h3_$j"
    }
    steps += ((s"xor($prev,$prev//${BigInt(1) << 33})", "f1"))
    steps += ((mm("f1", lit(P2)), "f2"))
    steps += ((s"xor(f2,f2//${BigInt(1) << 29})", "f3"))
    steps += ((mm("f3", lit(P3)), "f4"))
    steps += ((s"xor(f4,f4//${BigInt(1) << 32})", "f5"))
    var from = "b"
    val ctes = steps.zipWithIndex.map { case ((expr, col), i) =>
      val s = s"hc$i AS (SELECT *, $expr AS $col FROM $from)"
      from = s"hc$i"
      s
    }
    (ctes.mkString(",\n"), from)
  }

  // ---------------------------------------------------------------------
  // Murmur3_x86_32 (the public 32-bit MurmurHash3; Spark's
  // Murmur3_x86_32.hashUnsafeBytes) for <=8-byte strings — the hash the
  // built-in count_min_sketch derives its double-hashing buckets from.
  // All state lives in [0, 2^32); 32x32 products fit UBIGINT-range HUGEINT
  // directly (no split needed). Tail bytes are mixed ONE PER BLOCK (the
  // hashUnsafeBytes byte-at-a-time tail, not standard murmur's packed
  // tail).
  // ---------------------------------------------------------------------

  private val M32 = "4294967296::HUGEINT" // 2^32

  private def mixK1(k: String): String = {
    val m1 = s"((($k)*3432918353::HUGEINT)%$M32)"           // *0xcc9e2d51
    val r  = s"((($m1)*32768+($m1)//131072)%$M32)"          // rotl15
    s"((($r)*461845907::HUGEINT)%$M32)"                     // *0x1b873593
  }

  private def mixH1(h: String, k: String): String = {
    val x = s"xor($h,$k)"
    val r = s"((($x)*8192+($x)//524288)%$M32)"              // rotl13
    s"((($r)*5+3864292196::HUGEINT)%$M32)"                  // *5 + 0xe6546b64
  }

  /** Chained CTEs computing Murmur3_x86_32 of a <=8-byte string over input
    * relation `from` (must provide bs, n and the seed column/expr `seed`);
    * CTE names get `tag` appended so two chains (h1 and h2 = seeded by h1)
    * can coexist. The final CTE exposes the hash as column `mh$tag`. */
  private def murmurCtes(from: String, seed: String, tag: String): (String, String) = {
    val w1 = (0 until 4).map(i => s"bs[${i + 1}]*${BigInt(256).pow(i)}").mkString("+")
    val w2 = (4 until 8).map(i => s"bs[${i + 1}]*${BigInt(256).pow(i - 4)}").mkString("+")
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    steps += ((s"($seed)%$M32", s"g0$tag"))
    steps += ((s"CASE WHEN n>=4 THEN ${mixH1(s"g0$tag", mixK1(s"($w1)"))} ELSE g0$tag END", s"g1$tag"))
    steps += ((s"CASE WHEN n=8 THEN ${mixH1(s"g1$tag", mixK1(s"($w2)"))} ELSE g1$tag END", s"g2$tag"))
    // tail bytes: positions after the aligned length (none when n is 8)
    var prev = s"g2$tag"
    (0 until 3).foreach { j =>
      val byte = s"bs[((n//4)*4+${j + 1})::BIGINT]"
      steps += ((s"CASE WHEN n%4>$j THEN ${mixH1(prev, mixK1(byte))} ELSE $prev END", s"g3_$j$tag"))
      prev = s"g3_$j$tag"
    }
    // fmix32 with length
    steps += ((s"xor(xor($prev,n),xor($prev,n)//65536)", s"g4$tag"))
    steps += ((s"((g4$tag*2246822507::HUGEINT)%$M32)", s"g5$tag"))          // *0x85ebca6b
    steps += ((s"xor(g5$tag,g5$tag//8192)", s"g6$tag"))
    steps += ((s"((g6$tag*3266489909::HUGEINT)%$M32)", s"g7$tag"))          // *0xc2b2ae35
    steps += ((s"xor(g7$tag,g7$tag//65536)", s"mh$tag"))
    var f = from
    val ctes = steps.zipWithIndex.map { case ((expr, col), i) =>
      val s = s"mc$i$tag AS (SELECT *, $expr AS $col FROM $f)"
      f = s"mc$i$tag"
      s
    }
    (ctes.mkString(",\n"), f)
  }

  /** The complete q97 oracle: rebuild the count-min sketch exactly —
    * bucket_i(t) = |javaRem(toSigned32(h1 + i*h2), width)| with
    * h1 = murmur3(t, 0), h2 = murmur3(t, h1) (the double-hashing scheme
    * the built-in sketch uses), table cells as (row, bucket) sums over the
    * token stream, estimates as the per-token min cell. width 2000 and
    * depth 7 are ceil(2/eps) and ceil(-log2(1-confidence)) for the query's
    * (0.001, 0.99). */
  def cmsOracle: String = {
    val (m1Ctes, m1Final) = murmurCtes("b", "0::HUGEINT", "a")
    val (m2Ctes, m2Final) = murmurCtes(m1Final, "mha", "b")
    val rows = (0 until 7).map(i => s"($i)").mkString(",")
    s"""WITH tok AS (SELECT unnest(string_split(text,' ')) AS t FROM documents),
       |cnt AS (SELECT t, count(*) AS n_tok FROM tok GROUP BY t),
       |b AS (SELECT t, [unicode(ch)::HUGEINT FOR ch IN string_split(t,'')] AS bs,
       |             len(t)::HUGEINT AS n FROM (SELECT DISTINCT t FROM tok)),
       |$m1Ctes,
       |$m2Ctes,
       |hh AS (SELECT t, mha AS h1, mhb AS h2 FROM $m2Final),
       |d(i) AS (VALUES $rows),
       |bk AS (SELECT t, i,
       |         (CASE WHEN v >= 2147483648::HUGEINT
       |               THEN 4294967296::HUGEINT - v ELSE v END) % 2000 AS bucket
       |       FROM (SELECT t, i, (h1 + i*h2) % 4294967296::HUGEINT AS v
       |             FROM hh CROSS JOIN d)),
       |tbl AS (SELECT i, bucket, sum(n_tok) AS cell
       |        FROM bk JOIN cnt USING (t) GROUP BY i, bucket),
       |est AS (SELECT t, min(cell)::BIGINT AS est_n
       |        FROM bk JOIN tbl USING (i, bucket) GROUP BY t),
       |total AS (SELECT count(*) AS tot FROM tok),
       |top AS (SELECT t, n_tok AS exact_n FROM cnt
       |        ORDER BY n_tok DESC, t LIMIT 20)
       |SELECT t AS token, exact_n, est_n, est_n >= exact_n AS one_sided,
       |       round((est_n - exact_n)::DOUBLE / greatest(tot, 1), 6)
       |         AS overest_frac
       |FROM top JOIN est USING (t) CROSS JOIN total
       |ORDER BY exact_n DESC, token""".stripMargin
  }

  /** The complete q107 oracle: BPE merge-table training unrolled as
    * `nMerges` materialized CTE rounds. State per round is the word
    * histogram with each word's current symbol sequence encoded as a
    * DOUBLE-space-separated string ("  a  b  c  "): applying merge (l, r)
    * is then exactly `replace(s, ' l  r ', ' lr ')` — the pattern consumes
    * one space from each flanking boundary, so DuckDB's left-to-right
    * non-overlapping replace reproduces the trainer's greedy
    * left-to-right merge pass including the consecutive-repeat case
    * ("a a a a" → "aa aa", not "aa a a"). Per round: adjacent-pair counts
    * weighted by word frequency (a list-comprehension unnest), the argmax
    * with the trainer's (count desc, left, right) tie-break and the
    * minPairCount >= 2 stop as a LIMIT-1 filter (an empty best leaves the
    * state unchanged via LEFT JOIN ON TRUE, so post-convergence rounds
    * emit nothing — the stop is monotone). State CTEs are MATERIALIZED:
    * each is referenced twice (pair counts + next state) and DuckDB would
    * otherwise inline them, doubling the plan per round. */
  /** The shared BPE-training CTE block: w0 (histogram), st_0..st_nMerges
    * (per-round state) and best_0..best_{nMerges-1} (per-round merge, or
    * empty after convergence). */
  private def bpeTrainingCtes(nMerges: Int): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += """w0 AS (SELECT w, count(*) AS n FROM (
               |  SELECT unnest(string_split(text,' ')) AS w FROM documents)
               |  WHERE len(w) > 0 GROUP BY w)""".stripMargin
    parts += """st_0 AS MATERIALIZED (SELECT w, n,
               |  '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s
               |  FROM w0)""".stripMargin
    (0 until nMerges).foreach { r =>
      parts += s"""pc_$r AS (SELECT p.l AS l, p.r AS r, sum(n) AS c
                  |  FROM (SELECT n, unnest([{'l': sy[i], 'r': sy[i+1]}
                  |                          for i in range(1, len(sy))]) AS p
                  |        FROM (SELECT n,
                  |          string_split(substr(s, 3, len(s)-4), '  ') AS sy
                  |          FROM st_$r))
                  |  GROUP BY 1, 2)""".stripMargin
      parts += s"""best_$r AS MATERIALIZED (SELECT l, r, c FROM pc_$r
                  |  WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1)""".stripMargin
      parts += s"""st_${r + 1} AS MATERIALIZED (SELECT w, n,
                  |  CASE WHEN b.l IS NULL THEN s
                  |       ELSE replace(s, ' '||b.l||'  '||b.r||' ',
                  |                    ' '||b.l||b.r||' ') END AS s
                  |  FROM st_$r LEFT JOIN best_$r b ON TRUE)""".stripMargin
    }
    parts.mkString(",\n")
  }

  def bpeMergesOracle(nMerges: Int = 100): String = {
    val union = (0 until nMerges)
      .map(r => s"SELECT $r AS rank, l, r FROM best_$r")
      .mkString("\nUNION ALL ")
    "WITH " + bpeTrainingCtes(nMerges) + s""",
       |m AS ($union)
       |SELECT rank, l AS "left", r AS "right", l || r AS merged
       |FROM m ORDER BY rank""".stripMargin
  }

  /** The complete q107b oracle: fertility/round-trip stats of the GPT-2
    * BPE ENCODE over the corpus. For a word that appears in the training
    * histogram (every corpus word, here), encode equals the training
    * end-state for that word: the encode loop merges the lowest-ranked
    * pair present, and merging a pair can never CREATE an occurrence of a
    * lower-ranked pair (the lower-ranked pair's symbols existed before the
    * higher rank was learned — creation order), so rank-order application
    * == the loop == the training replay. The stats therefore read straight
    * off st_nMerges: pieces per word = its symbol count, round-trip concat
    * = the state minus separators. */
  def bpeEncodeOracle(nMerges: Int): String = {
    "WITH " + bpeTrainingCtes(nMerges) + s""",
       |pieces AS (SELECT w,
       |    len(string_split(substr(s, 3, len(s)-4), '  ')) AS np,
       |    replace(s, ' ', '') AS cat
       |  FROM st_$nMerges),
       |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
       |        FROM documents),
       |per_doc AS (SELECT doc_id, count(*) AS nw, sum(np) AS npieces,
       |    sum(len(w)) AS nchars,
       |    max(CASE WHEN cat <> w THEN 1 ELSE 0 END) AS bad
       |  FROM tok JOIN pieces USING (w) GROUP BY doc_id)
       |SELECT count(*) AS n_docs, sum(nw)::BIGINT AS n_words,
       |  sum(npieces)::BIGINT AS n_pieces,
       |  round(sum(npieces)::DOUBLE / sum(nw), 4) AS pieces_per_word,
       |  round(sum(nchars)::DOUBLE / sum(npieces), 4) AS chars_per_piece,
       |  sum(bad)::BIGINT AS n_roundtrip_fail
       |FROM per_doc""".stripMargin
  }

  /** The complete q134 oracle: WordPiece merge training unrolled like
    * [[bpeMergesOracle]] (same double-space state encoding and
    * boundary-aware replace; initial symbols carry the `##` continuation
    * prefix, merged = left + right-with-##-stripped). The round argmax is
    * the likelihood gain n(a,b)/(n(a)·n(b)) — a RATIONAL, compared
    * exactly: the key is floor(c · 10^30 / (n(a)·n(b))) in HUGEINT.
    * Soundness of the scaling: two distinct fractions with denominators
    * d ≤ D differ by ≥ 1/D², so with D = n(sym) ≤ total tokens ≈ 1.5e5 at
    * the gate SF (and ≤ ~3e6 before the 10^30 scale's margin thins to
    * single digits) the scaled keys differ by ≥ 10^4 while flooring
    * perturbs each by < 1 — order is exact, matching the trainer's BigInt
    * cross-multiplication. Ties: higher pair count, then lexicographically
    * smallest pair, as in the trainer. */
  def wordpieceMergesOracle(nMerges: Int = 100): String = {
    val scale = "1000000000000000000000000000000::HUGEINT" // 10^30
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += """w0 AS (SELECT w, count(*) AS n FROM (
               |  SELECT unnest(string_split(text,' ')) AS w FROM documents)
               |  WHERE len(w) > 0 GROUP BY w)""".stripMargin
    parts += """st_0 AS MATERIALIZED (SELECT w, n,
               |  '  ' || array_to_string(
               |    [CASE WHEN i = 1 THEN ch[i] ELSE '##' || ch[i] END
               |     for i in range(1, len(ch)+1)], '  ') || '  ' AS s
               |  FROM (SELECT w, n, string_split(w, '') AS ch FROM w0))""".stripMargin
    (0 until nMerges).foreach { r =>
      parts += s"""sy_$r AS MATERIALIZED (SELECT n,
                  |  string_split(substr(s, 3, len(s)-4), '  ') AS sy FROM st_$r)""".stripMargin
      parts += s"""un_$r AS (SELECT u, sum(n) AS un
                  |  FROM (SELECT n, unnest(sy) AS u FROM sy_$r) GROUP BY u)""".stripMargin
      parts += s"""pc_$r AS (SELECT p.l AS l, p.r AS r, sum(n) AS c
                  |  FROM (SELECT n, unnest([{'l': sy[i], 'r': sy[i+1]}
                  |                          for i in range(1, len(sy))]) AS p
                  |        FROM sy_$r)
                  |  GROUP BY 1, 2)""".stripMargin
      parts += s"""best_$r AS MATERIALIZED (
                  |  SELECT l, r, c,
                  |         l || CASE WHEN starts_with(r, '##')
                  |                   THEN substr(r, 3) ELSE r END AS m
                  |  FROM (SELECT pc.l, pc.r, pc.c,
                  |          (pc.c::HUGEINT * $scale)
                  |            // (ul.un::HUGEINT * ur.un::HUGEINT) AS key
                  |        FROM pc_$r pc JOIN un_$r ul ON pc.l = ul.u
                  |                       JOIN un_$r ur ON pc.r = ur.u)
                  |  WHERE c >= 2 ORDER BY key DESC, c DESC, l, r LIMIT 1)""".stripMargin
      parts += s"""st_${r + 1} AS MATERIALIZED (SELECT w, n,
                  |  CASE WHEN b.l IS NULL THEN s
                  |       ELSE replace(s, ' '||b.l||'  '||b.r||' ',
                  |                    ' '||b.m||' ') END AS s
                  |  FROM st_$r LEFT JOIN best_$r b ON TRUE)""".stripMargin
    }
    val union = (0 until nMerges)
      .map(r => s"SELECT $r AS rank, l, r, m, c FROM best_$r")
      .mkString("\nUNION ALL ")
    "WITH " + parts.mkString(",\n") + s""",
       |mm AS ($union)
       |SELECT rank, l AS "left", r AS "right", m AS merged,
       |       c::BIGINT AS pair_count
       |FROM mm ORDER BY rank""".stripMargin
  }

  /** The complete q34 oracle: distinct-token XXH64 CTEs + the per-(doc,
    * bit) simhash majority fold + brute-force hamming<=3 pairs (the Spark
    * side's 16-bit-chunk pigeonhole generates a candidate superset of the
    * hamming<=3 set, so post-filter both engines return the same rows). */
  def simhashOracle: String = {
    val (hashCtes, finalCte) = tokenHashCtes(seed = 7L)
    val pow2 = (0 until 64).map(b => s"($b,${BigInt(1) << b}::HUGEINT)").mkString(",")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
       |toks AS (SELECT DISTINCT t FROM tok),
       |b AS (SELECT t, [unicode(ch)::HUGEINT FOR ch IN string_split(t,'')] AS bs,
       |             len(t)::HUGEINT AS n FROM toks),
       |$hashCtes,
       |th AS (SELECT t, f5 FROM $finalCte),
       |j AS (SELECT doc_id, f5 FROM tok JOIN th USING (t)),
       |p(bit, p2) AS (VALUES $pow2),
       |bs2 AS (SELECT doc_id, p.p2,
       |          sum(CASE WHEN (f5 // p.p2) % 2 = 1 THEN 1 ELSE -1 END) AS s
       |        FROM j CROSS JOIN p GROUP BY doc_id, p.p2),
       |su AS (SELECT doc_id,
       |         sum(CASE WHEN s > 0 THEN p2 ELSE 0::HUGEINT END) AS sim
       |       FROM bs2 GROUP BY doc_id),
       |sv AS (SELECT doc_id,
       |         CASE WHEN sim >= 9223372036854775808::HUGEINT
       |              THEN (sim - 18446744073709551616::HUGEINT)::BIGINT
       |              ELSE sim::BIGINT END AS simb
       |       FROM su),
       |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         bit_count(xor(a.simb, b.simb))::INTEGER AS hamming
       |       FROM sv a JOIN sv b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }
}
