package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Corpus, Stats, Vocabulary}
import graft.sources.CorpusSources

/** End-to-end pipeline over a hand-verified mini fixture (SURVEY §5.4):
  * a 3-document corpus in vspace format (delimiter-separated), a tab
  * index, a source->subsource mapping, phrases + collections files.
  */
class VspacePipelineSpec extends SparkSpec {

  private lazy val dir = graft.SparkSpec.tempDir("vspace-fixture")

  private lazy val paths: Map[String, String] = {
    val delim = CorpusSources.RecordDelimiter
    // doc0: "Big Data! systems." -> [big, data, systems]
    // doc1: "data, data big"     -> [data, data, big]
    // doc2: "Spark."             -> [spark]
    val corpus = s"Big Data! systems. ${delim} data, data big ${delim} Spark."
    val index = Seq(
      "0\thttp://a\tsub1\t2020\t\tT0\tA\t\t\t",
      "1\thttp://b\tsub1\t2021\t\tT1\tB\t\t\t",
      "2\thttp://c\tsub2\t2021\t\tT2\tC\t\t\t").mkString("\n")
    val src2sub = Seq("SRC_A sub1", "SRC_B sub1,sub2").mkString("\n")
    val phrases = Seq("big_data extra", "ignored").mkString("\n")
    val collections = Seq("data_big").mkString("\n")
    val m = Map(
      "corpus" -> s"$dir/corpus.txt", "index" -> s"$dir/index.tsv",
      "src2sub" -> s"$dir/src2sub.txt", "phrases" -> s"$dir/phrases.txt",
      "collections" -> s"$dir/collections.txt")
    Files.writeString(java.nio.file.Paths.get(m("corpus")), corpus)
    Files.writeString(java.nio.file.Paths.get(m("index")), index)
    Files.writeString(java.nio.file.Paths.get(m("src2sub")), src2sub)
    Files.writeString(java.nio.file.Paths.get(m("phrases")), phrases)
    Files.writeString(java.nio.file.Paths.get(m("collections")), collections)
    m
  }

  test("corpus loader splits on the delimiter with contiguous ids") {
    val docs = CorpusSources.loadRawCorpus(spark, paths("corpus"))
      .orderBy("document_index").collect()
    assert(docs.length == 3)
    assert(docs.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(docs(2).getString(1).trim == "Spark.")
  }

  test("compat MapType output round-trips the long-format counts") {
    val corpus = CorpusSources.loadRawCorpus(spark, paths("corpus"))
    val long   = Corpus.tokenCounts(corpus, maxNgrams = 2)
    val mapped = Corpus.toTokenCountsMap(long).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getMap[String, Int](2))).toMap
    // doc1 "data, data big" -> wc 3; unigrams data:2 big:1; bigrams
    // "data data":1 "data big":1
    val (wc1, m1) = mapped(1L)
    assert(wc1 == 3)
    assert(m1("data") == 2 && m1("big") == 1 &&
      m1("data data") == 1 && m1("data big") == 1)
    // map cardinality equals long-format row count per doc
    val rows1 = long.filter(col("document_index") === 1).count()
    assert(m1.size.toLong == rows1)
  }

  test("sentinel tokens excluded; NFC unifies composed and decomposed forms") {
    import spark.implicits._
    // doc0 carries the reference's nferdoccount sentinel (base.py:378);
    // doc1/doc2 write café composed (U+00E9) vs decomposed (e + U+0301)
    val corpus = Seq(
      (0L, "big nferdoccount_7 data"),
      (1L, "café au lait"),
      (2L, "café au lait")).toDF("document_index", "text")
    val counts = Corpus.tokenCounts(corpus, maxNgrams = 1).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getInt(3)).toMap
    assert(!counts.keys.exists(_._2.contains("nferdoccount")))
    assert(counts((0L, "big")) == 1 && counts((0L, "data")) == 1)
    // both docs normalize to the same composed token
    assert(counts((1L, "café")) == 1 && counts((2L, "café")) == 1)
    // sentinel still counts toward wc (it is excluded from the gram
    // stream, not the tokenization; reference filters inside ngram_counts)
    val wc0 = Corpus.tokenCounts(corpus, 1).filter(col("document_index") === 0)
      .select("wc").head().getInt(0)
    assert(wc0 == 3)
  }

  test("vocabulary build: phrases+collections, underscores, dedup") {
    val vocab = Vocabulary.build(
      CorpusSources.loadPhrases(spark, paths("phrases")),
      CorpusSources.loadCollections(spark, paths("collections")))
    val tokens = vocab.select("token").collect().map(_.getString(0)).toSet
    // phrases: first field only, _ -> " "; collections: whole line
    assert(tokens == Set("big data", "ignored", "data big"))
  }

  test("latin-1 phrases decode via the encoding parameter (T5, base.py:253-266)") {
    val p = s"$dir/phrases_latin1.txt"
    val content = "café_crème extra\nnaïve"
    Files.write(java.nio.file.Paths.get(p),
      content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val latin1 = CorpusSources.loadPhrases(spark, p, encoding = "ISO-8859-1")
      .collect().map(_.getString(0)).toSet
    assert(latin1 == Set("café crème", "naïve"))
    // under the UTF-8 default those byte sequences are invalid and the
    // lines are dropped (reference try_decode semantics, enforced at the
    // byte level by is_valid_utf8 — T4)
    val utf8 = CorpusSources.loadPhrases(spark, p)
      .collect().map(_.getString(0)).toSet
    assert(utf8.isEmpty)
  }

  test("W1 divergence pinned: vocabulary is written pre-filtered") {
    import spark.implicits._
    // The reference writes the vocabulary CSV UNFILTERED and drops
    // null/empty tokens only while building the DAWG
    // (/root/reference/vspace/lookups/dawg.py:101-102); graft filters
    // BEFORE the write (Vocabulary.build), so on dirty input the written
    // vocabulary lacks the empty/whitespace rows the reference's file
    // would carry. Membership semantics are identical either way — the
    // reference's DAWG never contains those rows — only the written
    // artifact diverges. This fixture pins that choice.
    val phrases     = Seq("good one", "", "   ", "good one").toDF("phrase")
    val collections = Seq("other").toDF("phrase")
    val tokens = Vocabulary.build(phrases, collections)
      .select("token").collect().map(_.getString(0)).toSet
    assert(tokens == Set("good one", "other"))
    // preFilter = false reproduces the reference's unfiltered artifact
    val raw = Vocabulary.build(phrases, collections, preFilter = false)
      .select("token").collect().map(_.getString(0)).toSet
    assert(raw == Set("good one", "other", "", "   "))
  }

  test("token counts: normalized unigrams+bigrams, hand-checked") {
    val counts = Corpus.tokenCounts(
      CorpusSources.loadRawCorpus(spark, paths("corpus")), maxNgrams = 2)
    val rows = counts.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3))).toSet
    // doc0 [big, data, systems]: unigrams + "big data", "data systems"
    assert(rows.contains((0L, "big", 1)))
    assert(rows.contains((0L, "big data", 1)))
    assert(rows.contains((0L, "data systems", 1)))
    // doc1 [data, data, big]: data x2, "data data", "data big"
    assert(rows.contains((1L, "data", 2)))
    assert(rows.contains((1L, "data data", 1)))
    assert(rows.contains((1L, "data big", 1)))
    // doc2 [spark]
    assert(rows.contains((2L, "spark", 1)))
    // wc column
    val wc = counts.select("document_index", "wc").distinct().collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(wc == Map(0L -> 3, 1L -> 3, 2L -> 1))
  }

  test("vocabulary filter: unigrams pass, multigrams gated; both impls agree") {
    val counts = Corpus.tokenCounts(
      CorpusSources.loadRawCorpus(spark, paths("corpus")), maxNgrams = 2)
    val vocab = Vocabulary.build(
      CorpusSources.loadPhrases(spark, paths("phrases")),
      CorpusSources.loadCollections(spark, paths("collections")))

    val semi = Vocabulary.SemiJoinFilter(vocab)(counts, "token")
    val bcast = Vocabulary.BroadcastSetFilter(spark, vocab)(counts, "token")

    val semiSet = semi.select("document_index", "token").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val bcastSet = bcast.select("document_index", "token").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(semiSet == bcastSet)
    // all unigrams pass; of the bigrams only "big data" and "data big"
    // are in vocabulary
    assert(semiSet.contains((0L, "big data")))
    assert(semiSet.contains((1L, "data big")))
    assert(!semiSet.contains((0L, "data systems")))
    assert(!semiSet.contains((1L, "data data")))
    assert(semiSet.contains((2L, "spark")))
  }

  test("global stats DF/TF/tdsum hand-checked") {
    val counts = Corpus.tokenCounts(
      CorpusSources.loadRawCorpus(spark, paths("corpus")), maxNgrams = 1)
    val stats = Stats.computeStats(counts, Seq("token")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // data: docs 0,1; tf 1+2=3; tdsum 3+3=6
    assert(stats("data") == ((2L, 3L, 6L)))
    assert(stats("big") == ((2L, 2L, 6L)))
    assert(stats("systems") == ((1L, 1L, 3L)))
    assert(stats("spark") == ((1L, 1L, 1L)))
  }

  test("per-source stats through index and sources joins") {
    val counts = Corpus.tokenCounts(
      CorpusSources.loadRawCorpus(spark, paths("corpus")), maxNgrams = 1)
    val withSources = Stats.combineCorpusWithSources(counts,
      CorpusSources.loadIndex(spark, paths("index")),
      CorpusSources.loadSources(spark, paths("src2sub")))
    val stats = Stats.computeStats(withSources, Seq("token", "source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // sub1 -> docs 0,1 via SRC_A and SRC_B; sub2 -> doc2 via SRC_B
    assert(stats(("data", "SRC_A")) == 2L) // docs 0,1
    assert(stats(("data", "SRC_B")) == 2L)
    assert(stats(("spark", "SRC_B")) == 1L)
    assert(!stats.contains(("spark", "SRC_A")))
  }

  test("full pipeline writes five outputs from an INI config") {
    val out = graft.SparkSpec.tempDir("vspace-out")
    val conf =
      s"""[vspace_conf]
         |stagingloc = $dir/staging
         |outputFolder = $out
         |maxngrams = 2
         |[vspace_input]
         |corpus = ${paths("corpus")}
         |index2doc = ${paths("index")}
         |src2sub = ${paths("src2sub")}
         |collections = ${paths("collections")}
         |phrases = ${paths("phrases")}
         |""".stripMargin
    val confPath = s"$dir/job.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), conf)
    VspacePipeline.run(spark, VspaceConfig.load(confPath))
    val globals = spark.read.option("delimiter", "\t")
      .csv(s"$out/stats_global")
    assert(globals.count() > 0)
    val bySource = spark.read.option("delimiter", "\t")
      .csv(s"$out/stats_by_source")
    assert(bySource.count() > 0)
    assert(Files.exists(java.nio.file.Paths.get(s"$out/vocabulary")))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/normalized_corpus")))

    // corpusreader = v2 routes the scan through the DSV2 connector and, on
    // this single-file corpus, must produce identical global stats
    val out2 = graft.SparkSpec.tempDir("vspace-out-v2")
    VspacePipeline.run(spark, VspaceConfig.load(confPath)
      .copy(outputFolder = out2, corpusReader = "v2"))
    def statsSet(o: String) = spark.read.option("delimiter", "\t")
      .csv(s"$o/stats_global").collect().map(_.toSeq).toSet
    assert(statsSet(out2) == statsSet(out))

    // the DEFAULT path is hashed since round 14 (gram stream keyed by
    // xxhash64(gram), strings joined back at the stats output); the
    // string path — the independent A/B witness — must produce BOTH
    // stats tables exactly equal (the per-corpus certification the
    // hashed path's collision caveat relies on)
    assert(VspaceConfig.load(confPath).hashedStats,
      "INI without a hashedstats key must default to the hashed path")
    val out3 = graft.SparkSpec.tempDir("vspace-out-string")
    VspacePipeline.run(spark, VspaceConfig.load(confPath)
      .copy(outputFolder = out3, hashedStats = false))
    assert(statsSet(out3) == statsSet(out))
    def bySourceSet(o: String) = spark.read.option("delimiter", "\t")
      .csv(s"$o/stats_by_source").withColumn(
        "source", regexp_extract(input_file_name(), "source=([^/]+)", 1))
      .collect().map(_.toSeq).toSet
    assert(bySourceSet(out3) == bySourceSet(out))
  }
}
