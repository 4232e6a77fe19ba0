package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NormalizeText, RollingHash}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface of the engine: registers graft's expression library with a
  * session via `spark.sql.extensions=graft.GraftExtensions`, so every
  * capability reachable from the Column API is equally reachable from
  * `spark.sql(...)` / JDBC / notebooks — the reference exposes its text
  * kernels only inside its own pipeline (`/root/reference/vspace/utils/
  * text.py:5-17` is a Python closure invisible to SQL); here they are
  * first-class Catalyst functions that stay inside WholeStageCodegen.
  *
  * Registered functions:
  *   - `normalize_text(s)`       — NFC + lowercase + `\w+` re-join (F1)
  *   - `rolling_hash(s)`         — 64-bit polynomial fingerprint hash
  *   - `xxhash64_seeded(seed,…)` — seeded hash family (MinHash/SimHash)
  *   - `cosine_sim(a, b)`        — cosine similarity of array<double>
  *   - `word_ngrams(toks, n)`    — exact-n word n-grams, space-joined
  *   - `everygrams(toks, lo, hi)`— all n-grams for n in [lo, hi]
  *   - `zorder_key(c1, c2, …)`   — Morton bit-interleave layout key
  *   - `top_k(e, k[, smallest])` — bounded-heap per-group top-k aggregate
  *   - `word_ngrams_distinct(toks, n)` — fused distinct n-grams
  *   - `word_ngram_hashes(toks, n, seed)` — fused per-window gram hashes
  *   - `set_jaccard(a, b)`       — one-pass exact set-Jaccard
  *   - `minhash_signatures(h, k)`— fused k-family MinHash signature
  *   - `top_count(arr)`          — fused max element multiplicity
  *   - `window_mins(h, w)`       — fused sliding-window minima
  *   - `codepoint_energy(s)`     — fused sum of squared codepoints
  *   - `best_cosine(v, bench)`   — fused best-cosine broadcast fold
  *   - `shared_span_stats(a,b,w)`— fused shared-span merge statistics
  *   - `simhash64(hashes)`       — fused 64-bit SimHash majority fold
  *   - `word_ngram_top_count(t,n)` — fused gram-free max multiplicity
  *   - `word_ngram_rolling_hashes(t,n)` — fused gram-free rolling hashes
  *   - `ngram_count_hashes(t,maxN)` — hash-keyed in-row n-gram histogram
  *
  * All of these compose from built-ins or codegen'd expressions — no UDF
  * registry entries, so SQL users get identical plans (and identical 100 TB
  * scaling) to Column-API users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** Adapt a Column-level combinator into a SQL function builder (the
    * Column result is fully converted back to a Catalyst tree — lambda
    * nodes and all — since the registry hands it straight to the analyzer). */
  private def fromColumns(f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    exprs => Bridge.toExpression(f(exprs.map(Bridge.column)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rewrite: size(split(s,' ',-1)) -> allocation-free byte
    // scan (see plans/TokenCountRewrite); semantics-identical, proven by
    // the oracle gate on every query using the idiom
    ext.injectOptimizerRule(_ => graft.plans.TokenCountRewrite)
    // probe-side predicate pushdown through the custom join nodes (built-in
    // PushDownPredicates stops at unknown logical plans)
    ext.injectOptimizerRule(_ => graft.plans.PushThroughGraftJoins)
    ext.injectOptimizerRule(_ => graft.plans.PruneThroughGraftJoins)

    // physical planning for the interval-stabbing join operator
    // (plans/RangeJoin — the custom LogicalPlan + SparkPlan pair)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((FunctionIdentifier("token_count"),
      info("token_count", "token_count(str) - space-delimited token count, equal to size(split(str, ' ', -1)) without materializing the array."),
      (exprs: Seq[Expression]) => graft.functions.TokenCount(exprs.head)))

    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(str) - NFC + lowercase + word-char runs joined by spaces."),
      (exprs: Seq[Expression]) => NormalizeText(exprs.head)))

    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial hash over the 2^64 ring."),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))

    ext.injectFunction((FunctionIdentifier("xxhash64_seeded"),
      info("xxhash64_seeded", "xxhash64_seeded(seed, expr...) - xxhash64 under an explicit seed (independent hash families)."),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          exprs.tail,
          exprs.head.eval(null).asInstanceOf[Number].longValue())))

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity (prefix scale 0.1, cap 4, boost when jaro > 0.7; empty -> 0)."),
      (exprs: Seq[Expression]) => graft.functions.JaroWinkler(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors (codegen'd kernel)."),
      (exprs: Seq[Expression]) => graft.functions.VecDot(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double> vectors."),
      fromColumns { case Seq(a, b) => graft.functions.cosine_sim(a, b) }))

    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(tokens, n) - space-joined n-grams of exactly n tokens."),
      fromColumns { case Seq(toks, n) => graft.functions.word_ngrams(toks, n) }))

    ext.injectFunction((FunctionIdentifier("ngram_counts"),
      info("ngram_counts", "ngram_counts(tokens, maxN) - in-row per-document n-gram histogram as array<struct<token,tf>>."),
      (exprs: Seq[Expression]) => graft.functions.NGramCounts(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("ngram_count_hashes"),
      info("ngram_count_hashes", "ngram_count_hashes(tokens, maxN) - hash-keyed in-row n-gram histogram as array<struct<h,n,tf,tok>> with h = xxhash64(gram) and tok the unigram string (null for multigrams)."),
      (exprs: Seq[Expression]) => graft.functions.NGramCountHashes(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("everygrams"),
      info("everygrams", "everygrams(tokens, lo, hi) - all n-grams for n in [lo, hi], flattened."),
      (exprs: Seq[Expression]) => {
        val lo = exprs(1).eval(null).asInstanceOf[Number].intValue()
        val hi = exprs(2).eval(null).asInstanceOf[Number].intValue()
        Bridge.toExpression(
          graft.functions.everygrams(Bridge.column(exprs.head), lo, hi))
      }))

    ext.injectFunction((FunctionIdentifier("word_ngrams_distinct"),
      info("word_ngrams_distinct", "word_ngrams_distinct(tokens, n) - distinct space-joined n-grams, first-occurrence order; fused one-pass equivalent of array_distinct(word_ngrams(tokens, n)) on every input including null (-> empty array)."),
      (exprs: Seq[Expression]) => graft.functions.WordNgramsDistinct(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("word_ngram_hashes"),
      info("word_ngram_hashes", "word_ngram_hashes(tokens, n, seed) - one xxhash64 per n-token window, bit-equal to hashing the space-joined gram strings, with no gram materialization; null input -> empty array, like the composed form."),
      (exprs: Seq[Expression]) => graft.functions.WordNgramHashes(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Number].longValue())))

    ext.injectFunction((FunctionIdentifier("set_jaccard"),
      info("set_jaccard", "set_jaccard(a, b) - exact set-Jaccard of two string arrays, equal to size(array_intersect(a,b))/size(array_union(a,b)) under default (non-ANSI) SQL, without materializing either array. Both-empty input is 0/0 and returns NULL (ANSI mode of the composed form would raise DIVIDE_BY_ZERO)."),
      (exprs: Seq[Expression]) => graft.functions.SetJaccard(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("minhash_signatures"),
      info("minhash_signatures", "minhash_signatures(hashes, k) - k-family MinHash signature of an array<long>: element i = min over the array of xxhash64_seeded(i, x), all families in one pass."),
      (exprs: Seq[Expression]) => graft.functions.MinHashSignatures(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("top_count"),
      info("top_count", "top_count(arr) - max element multiplicity of a string array, equal to array_max(transform(array_distinct(arr), x -> size(filter(arr, y -> y = x)))) in one hashed pass; empty -> null, null elements count 0."),
      (exprs: Seq[Expression]) => graft.functions.TopCount(exprs.head)))

    ext.injectFunction((FunctionIdentifier("window_mins"),
      info("window_mins", "window_mins(hashes, w) - sliding minima of an array<long>: element k = min of the w-wide window starting at k, output length max(n-w+1, 1); the winnowing fold, fused."),
      (exprs: Seq[Expression]) => graft.functions.WindowMins(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("codepoint_energy"),
      info("codepoint_energy", "codepoint_energy(str) - sum of squared codepoints, equal to the per-char ascii(substr())^2 aggregate fold in one decode loop; empty -> 0."),
      (exprs: Seq[Expression]) => graft.functions.CodepointEnergy(exprs.head)))

    ext.injectFunction((FunctionIdentifier("best_cosine"),
      info("best_cosine", "best_cosine(v, bench) - struct(sim, id): best HALF_UP-4dp-rounded cosine of v against an array<struct<id,bv>> (ascending visit order keeps the lowest id on rounded ties)."),
      (exprs: Seq[Expression]) => graft.functions.BestCosine(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("word_ngram_top_count"),
      info("word_ngram_top_count", "word_ngram_top_count(tokens, n) - max multiplicity over the n-token windows, equal to top_count(word_ngrams(tokens, n)) with no gram array; fewer than n tokens -> null."),
      (exprs: Seq[Expression]) => graft.functions.WordNgramTopCount(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("word_ngram_rolling_hashes"),
      info("word_ngram_rolling_hashes", "word_ngram_rolling_hashes(tokens, n) - rolling_hash of every n-token window, bit-equal to transform(word_ngrams(tokens, n), g -> rolling_hash(g)) with no gram strings; null input -> empty array."),
      (exprs: Seq[Expression]) => graft.functions.WordNgramRollingHashes(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an array<long>: bit b set iff the count of hashes with bit b set exceeds the count without; one pass (empty or any-null input -> 0)."),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))

    ext.injectFunction((FunctionIdentifier("shared_span_stats"),
      info("shared_span_stats", "shared_span_stats(wa, wb, w) - struct(n, mx, cov): merged shared-window spans of two window arrays (positions of wa whose window occurs in wb, intervals [p, p+w-1] merged when overlapping/adjacent)."),
      (exprs: Seq[Expression]) => graft.functions.SharedSpanStats(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue())))

    ext.injectFunction((FunctionIdentifier("zorder_key"),
      info("zorder_key", "zorder_key(c1, c2, ...) - Z-order (Morton) bit-interleave of non-negative long dimension columns; sort by it before writing for multi-dimensional file clustering."),
      (exprs: Seq[Expression]) => graft.functions.ZOrderKey(exprs)))

    ext.injectFunction((FunctionIdentifier("top_k"),
      info("top_k", "top_k(expr, k[, smallest]) - the k greatest (or least) values per group, sorted best-first; bounded-heap aggregate with map-side partial reduction."),
      (exprs: Seq[Expression]) => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        val smallest = exprs.length > 2 &&
          exprs(2).eval(null).asInstanceOf[Boolean]
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          exprs.head, k, smallest, 0, 0)
      }))
  }
}
