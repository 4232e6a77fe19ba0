package graft

import org.apache.spark.sql.Row

/** The SQL surface registered by [[GraftExtensions]]: every function must
  * return exactly what its Column-API twin returns, from a plain
  * `spark.sql(...)` string. */
class GraftExtensionsSpec extends SparkSpec {

  test("normalize_text is callable from SQL and matches the Column API") {
    val r = spark.sql("SELECT normalize_text('Hello, World!  CAFÉ') AS n").head()
    assert(r.getString(0) == "hello world café")
  }

  test("rolling_hash from SQL agrees with the Column API") {
    import spark.implicits._
    val df = Seq("abc", "", "the quick brown fox").toDF("s")
    df.createOrReplaceTempView("rh_in")
    val viaSql = spark.sql("SELECT s, rolling_hash(s) AS h FROM rh_in")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCol = df.select($"s", graft.functions.rolling_hash($"s").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("xxhash64_seeded gives distinct families per seed, stable per seed") {
    val rows = spark.sql(
      """SELECT xxhash64_seeded(1, 'tok') AS a, xxhash64_seeded(2, 'tok') AS b,
        |       xxhash64_seeded(1, 'tok') AS a2""".stripMargin).head()
    assert(rows.getLong(0) != rows.getLong(1))
    assert(rows.getLong(0) == rows.getLong(2))
  }

  test("cosine_sim from SQL: orthogonal -> 0, identical -> 1") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS o,
        |       cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS i""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("ngram_counts from SQL computes the in-row histogram") {
    val r = spark.sql(
      "SELECT ngram_counts(array('a','b','a'), 2) AS h").head()
    val entries = r.getSeq[Row](0)
      .map(e => e.getString(0) -> e.getInt(1)).toMap
    assert(entries == Map("a" -> 2, "b" -> 1, "a b" -> 1, "b a" -> 1))
  }

  test("word_ngrams and everygrams from SQL") {
    val r = spark.sql(
      """SELECT word_ngrams(array('a','b','c'), 2) AS bi,
        |       everygrams(array('a','b','c'), 1, 3) AS ev""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) ==
      Seq("a", "b", "c", "a b", "b c", "a b c"))
  }

  test("SQL-registered normalize_text stays codegen'd (no UDF in the plan)") {
    val plan = spark.sql("SELECT normalize_text('x') AS n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("zorder_key from SQL matches the Column API and the bit definition") {
    val r = spark.sql("SELECT zorder_key(7L, 3L) AS z").head()
    // bit b of col c lands at position b*2+c: 7=(111), 3=(011)
    // -> z = 0b011111 = 31
    assert(r.getLong(0) == 31L)
  }

  test("top_k from SQL is the bounded-heap aggregate, greatest and least") {
    import spark.implicits._
    Seq(("a", 5), ("a", 9), ("a", 1), ("b", 2), ("b", 8))
      .toDF("g", "x").createOrReplaceTempView("tk_in")
    val rows = spark.sql(
      """SELECT g, top_k(x, 2) AS hi, top_k(x, 2, true) AS lo
        |FROM tk_in GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getSeq[Int](1) == Seq(9, 5) && rows(0).getSeq[Int](2) == Seq(1, 5))
    assert(rows(1).getSeq[Int](1) == Seq(8, 2) && rows(1).getSeq[Int](2) == Seq(2, 8))
  }

  test("a full stats query runs end-to-end in pure SQL") {
    import spark.implicits._
    Seq((0L, "The Cat! sat"), (1L, "the cat SAT down"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
    val out = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS document_frequency,
        |       count(*) AS term_frequency
        |FROM (SELECT doc_id, explode(split(normalize_text(text), ' ')) AS token
        |      FROM sql_docs)
        |GROUP BY token ORDER BY token""".stripMargin).collect()
    assert(out.toSeq == Seq(
      Row("cat", 2L, 2L), Row("down", 1L, 1L), Row("sat", 2L, 2L),
      Row("the", 2L, 2L)))
  }

  test("TokenCountRewrite replaces size(split(s,' ')) and preserves semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split}
    // edge cases where the equivalence could plausibly break: empties,
    // leading/trailing/doubled spaces, multi-byte UTF-8, tabs (NOT split)
    val docs = Seq("", "a", "a b", " a", "a ", "a  b", "héllo wörld",
      "汉字 文本", "a\tb", "   ").toDF("text")
    val rewritten = docs.select(size(split(col("text"), " ")).as("n"))
    // a literal LocalRelation constant-folds away; assert the rewrite on
    // a non-foldable source (range), where the expression survives
    import org.apache.spark.sql.functions.{concat, lit}
    val live = spark.range(4)
      .select(concat(lit("a "), col("id").cast("string")).as("text"))
      .select(size(split(col("text"), " ")).as("n"))
    val opt = live.queryExecution.optimizedPlan.toString
    assert(opt.contains("token_count"), s"rewrite did not fire:\n$opt")
    assert(live.collect().map(_.getInt(0)).forall(_ == 2))
    // the explicit default limit spells the same pattern: also rewritten
    val explicit = spark.range(1)
      .select(concat(lit("x y"), col("id").cast("string")).as("text"))
      .select(size(split(col("text"), " ", -1)).as("n"))
    assert(explicit.queryExecution.optimizedPlan.toString.contains("token_count"))
    // compute the expected values in plain Scala (Java regex split, -1)
    val expect = Seq("", "a", "a b", " a", "a ", "a  b", "héllo wörld",
      "汉字 文本", "a\tb", "   ").map(_.split(" ", -1).length)
    assert(rewritten.collect().map(_.getInt(0)).toSeq == expect)
  }

  test("TokenCountRewrite leaves other split patterns untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split}
    import org.apache.spark.sql.functions.{concat, lit, when}
    // non-foldable source so the negative assertions actually see a plan
    val docs = spark.range(1)
      .select(concat(lit("a,b c"), when(col("id") < 0, "z").otherwise(""))
        .as("text"))
    val comma = docs.select(size(split(col("text"), ",")).as("n"))
    assert(!comma.queryExecution.optimizedPlan.toString.contains("token_count"))
    assert(comma.head().getInt(0) == 2)
    val limited = docs.select(size(split(col("text"), " ", 1)).as("n"))
    assert(!limited.queryExecution.optimizedPlan.toString.contains("token_count"))
    assert(limited.head().getInt(0) == 1)
    // regex pattern that merely CONTAINS a space must not match
    val rx = docs.select(size(split(col("text"), " |,")).as("n"))
    assert(!rx.queryExecution.optimizedPlan.toString.contains("token_count"))
    assert(rx.head().getInt(0) == 3)
  }

  test("token_count is exposed in SQL and stays codegen'd") {
    val r = spark.sql("SELECT token_count('a  b c') AS n").head()
    assert(r.getInt(0) == 4)
    val plan = spark.sql("SELECT token_count('x y') AS n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("fused n-gram kernels from SQL match their composed twins") {
    val r = spark.sql(
      """SELECT word_ngrams_distinct(array('a','b','a','b'), 2) AS d,
        |       word_ngram_hashes(array('a','b','c'), 2, 56) AS h,
        |       transform(word_ngrams(array('a','b','c'), 2),
        |                 g -> xxhash64_seeded(56, g)) AS href,
        |       set_jaccard(array('x','y','z'), array('y','z','w')) AS j,
        |       minhash_signatures(array(42L, -7L), 4) AS sig""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b", "b a"))
    assert(r.getSeq[Long](1) == r.getSeq[Long](2))
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    val sig = r.getSeq[Long](4)
    assert(sig.length == 4 && sig == sig) // deterministic, 4 families
    val again = spark.sql(
      "SELECT minhash_signatures(array(42L, -7L), 4) AS sig").head().getSeq[Long](0)
    assert(sig == again)
  }

  test("fused fold kernels from SQL match their composed twins") {
    val r = spark.sql(
      """SELECT top_count(array('a','b','a','a')) AS tc,
        |       array_max(transform(array_distinct(array('a','b','a','a')),
        |         x -> size(filter(array('a','b','a','a'), y -> y = x)))) AS tcref,
        |       window_mins(array(9L,2L,7L,5L,1L,8L), 4) AS wm,
        |       transform(sequence(1, greatest(size(array(9L,2L,7L,5L,1L,8L)) - 3, 1)),
        |         i -> array_min(slice(array(9L,2L,7L,5L,1L,8L), i, 4))) AS wmref,
        |       codepoint_energy('abc') AS ce,
        |       shared_span_stats(array('a b','b c','x y'), array('a b','x y'), 2) AS sp
        |""".stripMargin).head()
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) == 3)
    assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    assert(math.abs(r.getDouble(4) - (97.0*97 + 98.0*98 + 99.0*99)) < 1e-12)
    val sp = r.getStruct(5)
    // matches at p=1 ('a b') and p=3 ('x y'); intervals [1,2] and [3,4]
    // are ADJACENT (3 <= e+1 = 3) so they merge: one span [1,4]
    assert(sp.getInt(0) == 1 && sp.getInt(1) == 4 && sp.getInt(2) == 4)
    // best_cosine: orthogonal vs identical benchmark vectors
    val bc = spark.sql(
      """SELECT best_cosine(array(1D, 0D),
        |  array(struct(10L AS id, array(0D, 1D) AS bv),
        |        struct(11L AS id, array(1D, 0D) AS bv))) AS b""".stripMargin)
      .head().getStruct(0)
    assert(bc.getDouble(0) == 1.0 && bc.getLong(1) == 11L)
  }
}
