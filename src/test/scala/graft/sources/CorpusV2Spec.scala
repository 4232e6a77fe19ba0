package graft.sources

import java.nio.file.{Files, Paths}

import scala.util.Random

import graft.SparkSpec

/** The DSV2 corpus connector (`vspace-corpus`) against the built-in
  * `lineSep` text source as ground truth: identical records in identical
  * order across adversarial chunk boundaries (chunk sizes far smaller than
  * the delimiter force splits to start mid-delimiter), plus the edge shapes
  * a split reader gets wrong first — leading/trailing/adjacent delimiters,
  * empty files, single-split files.
  */
class CorpusV2Spec extends SparkSpec {

  private val delim = CorpusSources.RecordDelimiter

  private def write(name: String, content: String): String = {
    val dir = graft.SparkSpec.tempDir("corpus-v2")
    val p = s"$dir/$name"
    Files.writeString(Paths.get(p), content)
    p
  }

  private def v2(path: String, chunk: Long) =
    spark.read.format("vspace-corpus")
      .option("chunkBytes", chunk.toString)
      .load(path)

  private def builtin(path: String) =
    spark.read.option("lineSep", delim).text(path)
      .collect().map(_.getString(0)).toSeq

  test("matches the built-in lineSep reader across many odd split boundaries") {
    val rnd = new Random(7)
    val docs = (0 until 200).map { i =>
      if (i % 29 == 0) "" // adjacent delimiters
      else (0 until rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
    }
    val path = write("corpus.txt", docs.mkString(delim))
    val expected = builtin(path)
    // 1031 is prime, so boundaries land at odd offsets; 64 is smaller than
    // the 194-byte delimiter, so those splits start mid-record or
    // mid-delimiter, exercising the lookback path constantly
    for (chunk <- Seq(1031L, 64L, 8192L, 1L << 20)) {
      val got = v2(path, chunk).orderBy("pos")
        .collect().map(_.getString(2)).toSeq
      assert(got == expected, s"chunk=$chunk")
    }
  }

  test("splits into multiple partitions and records carry their offsets") {
    val docs = (0 until 50).map(i => s"doc $i")
    val path = write("c.txt", docs.mkString(delim))
    val df = v2(path, 1031L)
    assert(df.rdd.getNumPartitions > 1)
    val rows = df.orderBy("pos").collect()
    assert(rows.map(_.getString(2)).toSeq == docs)
    // offsets are exact byte positions: doc i starts after i delimiters
    // and the i previous docs
    val starts = rows.map(_.getLong(1)).toSeq
    assert(starts.head == 0L)
    assert(starts(1) == "doc 0".length + delim.length)
    assert(rows.forall(_.getString(0).endsWith("c.txt")))
  }

  test("edge shapes: trailing, leading, empty file, delimiter-only") {
    def texts(content: String, chunk: Long = 64L): Seq[String] = {
      val p = write("e.txt", content)
      val got = v2(p, chunk).orderBy("pos").collect().map(_.getString(2)).toSeq
      assert(got == builtin(p), s"content=${content.take(30)}…")
      got
    }
    assert(texts(s"a${delim}b${delim}") == Seq("a", "b")) // trailing dropped
    assert(texts(s"${delim}a") == Seq("", "a")) // leading empty kept
    assert(texts(delim) == Seq("")) // delimiter-only: one empty record
    assert(texts("solo", chunk = 1L << 20) == Seq("solo")) // single split
    val empty = write("empty.txt", "")
    assert(v2(empty, 64L).count() == 0)
  }

  test("column pruning reaches the connector") {
    val path = write("p.txt", Seq("a", "b", "c").mkString(delim))
    val df = v2(path, 1L << 20).select("pos")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L + delim.length, 2L * (1 + delim.length)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pos") && !plan.contains("text"),
      s"scan should prune to pos only:\n$plan")
  }

  test("border-free delimiters match the built-in reader at EVERY boundary") {
    // A delimiter with no border (no proper prefix = suffix) cannot overlap
    // itself, so every occurrence is canonical and split ownership is
    // boundary-independent — sweep chunk sizes down to 1 byte to prove it.
    val cases = Seq(
      ("ab", Seq("aab", "ba", "", "bbb", "a")),
      ("ba!", Seq("b", "", "ab", "aa!b", "!a")))
    for ((d, docs) <- cases) {
      val p = write(s"bf-${d.length}.txt", docs.mkString(d))
      val expected = spark.read.option("lineSep", d).text(p)
        .collect().map(_.getString(0)).toSeq
      for (chunk <- Seq(1L, 2L, 3L, 7L, 1024L)) {
        val got = spark.read.format("vspace-corpus")
          .option("delimiter", d).option("chunkBytes", chunk.toString)
          .load(p).orderBy("pos").collect().map(_.getString(2)).toSeq
        assert(got == expected, s"delim=$d chunk=$chunk: $got vs $expected")
      }
    }
  }

  test("self-overlapping delimiters are canonical in a single split") {
    // Delimiters with a period ("aba", "aa", "xx") admit misaligned
    // occurrences that NO local split algorithm can tokenize canonically
    // (a boundary inside a misaligned run stays misaligned — the same
    // caveat applies to Hadoop's delimited TextInputFormat). The connector
    // contract: such content is canonical within one split; the KMP
    // failure-function path still gets exercised here.
    val cases = Seq(
      ("aba", Seq("x", "bab", "", "ab", "cc")),
      ("aa", Seq("", "b", "a-a", "", "zz")),
      ("xx", Seq("axbxcx", "x", "", "xax")))
    for ((d, docs) <- cases) {
      val p = write(s"ov-${d.length}.txt", docs.mkString(d))
      val expected = spark.read.option("lineSep", d).text(p)
        .collect().map(_.getString(0)).toSeq
      val got = spark.read.format("vspace-corpus")
        .option("delimiter", d).option("chunkBytes", (1L << 20).toString)
        .load(p).orderBy("pos").collect().map(_.getString(2)).toSeq
      assert(got == expected, s"delim=$d: $got vs $expected")
    }
  }

  test("loadRawCorpusV2 assigns the same contiguous ids as the T1 loader") {
    val docs = (0 until 30).map(i => s"document number $i with words")
    val path = write("ids.txt", docs.mkString(delim))
    val v1 = CorpusSources.loadRawCorpus(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v2r = CorpusSources.loadRawCorpusV2(spark, path, chunkBytes = 101L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2r == v1)
  }

  test("BOTH loaders assign identical multi-file ids: (file path, offset) order") {
    // the shared contract: lexicographic file order then byte order, for
    // the built-in loader AND the V2 connector. b.txt is made LARGER than
    // a.txt on purpose: loadRawCorpus used to hand the built-in text source
    // the whole directory, whose split packing is largest-file-first — that
    // would put b's docs ahead of a's here. It now enumerates files itself
    // and unions per-file reads in sorted order.
    val dir = graft.SparkSpec.tempDir("corpus-v2-multi")
    Files.writeString(Paths.get(s"$dir/a.txt"), Seq("a1", "a2").mkString(delim))
    val bDocs = Seq("b1 padded with extra words to make file b the larger one",
      "b2 also long enough to matter", "b3 trailing doc")
    Files.writeString(Paths.get(s"$dir/b.txt"), bDocs.mkString(delim))
    val expected = (Seq("a1", "a2") ++ bDocs).zipWithIndex
      .map { case (t, i) => i.toLong -> t }.toMap
    val v1 = CorpusSources.loadRawCorpus(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 == expected, "builtin loader id order")
    for (chunk <- Seq(5L, 64L, 1L << 20)) {
      val got = CorpusSources.loadRawCorpusV2(spark, dir, chunkBytes = chunk)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"chunk=$chunk")
    }
  }

  test("loadRawCorpusV2 ids are assigned relationally: no RDD boundary in the plan") {
    // the old path dropped to .rdd.zipWithIndex — an extra partition-count
    // job over the full scan AND a plan break (no pruning/codegen across
    // it). The offset-based path is a BatchScan + broadcast join of the
    // metadata-sized per-split base table.
    val docs = (0 until 40).map(i => s"doc $i words here")
    val path = write("rel.txt", docs.mkString(delim))
    val df = CorpusSources.loadRawCorpusV2(spark, path, chunkBytes = 101L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"id assignment broke the plan:\n$plan")
    assert(plan.contains("BatchScan"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"base table should broadcast:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
  }

  test("V2 write round-trips through both readers and overwrite truncates") {
    import spark.implicits._
    val dir = graft.SparkSpec.tempDir("corpus-v2-write") + "/out"
    val docs = (0 until 37).map(i => s"doc $i body word$i")
    docs.toDF("text").repartition(3)
      .write.format("vspace-corpus").mode("append").save(dir)
    // both readers must see the identical document multiset (file order
    // differs from input order by design — ids are (file, offset) based)
    val viaBuiltin = spark.read.option("lineSep", delim).text(dir)
      .collect().map(_.getString(0)).toSeq.sorted
    val viaV2 = v2(dir, 64L).collect().map(_.getString(2)).toSeq.sorted
    assert(viaBuiltin == docs.sorted)
    assert(viaV2 == docs.sorted)
    // overwrite truncates: a second, smaller write replaces the corpus
    val docs2 = (0 until 5).map(i => s"second $i")
    docs2.toDF("text").repartition(2)
      .write.format("vspace-corpus").mode("overwrite").save(dir)
    val after = v2(dir, 1031L).collect().map(_.getString(2)).toSeq.sorted
    assert(after == docs2.sorted)
    // empty partitions commit no file
    docs2.toDF("text").repartition(8)
      .write.format("vspace-corpus").mode("overwrite").save(dir)
    val again = spark.read.option("lineSep", delim).text(dir)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(again == docs2.sorted)
  }
}
