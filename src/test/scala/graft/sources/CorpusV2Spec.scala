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
    val dir = Files.createTempDirectory("corpus-v2").toString
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
    // 1031 is prime and < delimiter length: every split starts mid-record
    // or mid-delimiter, exercising the lookback path constantly
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

  test("loadRawCorpusV2 assigns the same contiguous ids as the T1 loader") {
    val docs = (0 until 30).map(i => s"document number $i with words")
    val path = write("ids.txt", docs.mkString(delim))
    val v1 = CorpusSources.loadRawCorpus(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v2r = CorpusSources.loadRawCorpusV2(spark, path, chunkBytes = 101L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2r == v1)
  }
}
