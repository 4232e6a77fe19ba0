package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-reader bench: built-in `lineSep` text source vs the native DSV2
  * connector on the same delimiter-separated corpus, reported as GB/h (the
  * BASELINE.md unit). Two modes:
  *
  *   runMain graft.tools.ReaderBench <corpusPathOrGlob>
  *   runMain graft.tools.ReaderBench --gb <n> [workDir]
  *
  * `--gb` synthesizes (once, reused across runs) an ~n GB corpus in the
  * reference's 239-char-delimiter format by replicating the SPARK_GRAFT_SF_DIR
  * documents with a per-copy marker (same generator shape as
  * ThroughputBench). The measured job is a full scan + sum(length(text)) —
  * pure reader throughput, no downstream pipeline — and the summed char
  * count doubles as the sanity check that every reader saw every byte.
  */
object ReaderBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val delim = graft.sources.CorpusSources.RecordDelimiter

    val path =
      if (args.headOption.contains("--gb")) {
        val targetGB = args(1).toDouble
        val workDir  = if (args.length > 2) args(2) else "target/rbench"
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val tag = f"$targetGB%.2f".replace('.', 'p')
        val dir = Paths.get(s"$workDir/corpus_$tag")
        if (!Files.exists(dir.resolve("_DONE_RB"))) {
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
            .select(col("doc_id"), col("text"))
          val st = docs.agg(count(lit(1)), sum(length(col("text")))).head()
          val copies = math.max(1L,
            math.ceil(targetGB * 1e9 / (st.getLong(1) + st.getLong(0) * 8)).toLong)
          docs.crossJoin(spark.range(copies).toDF("copy"))
            .select(concat(col("text"), lit(" c"), col("copy")).as("value"))
            .repartition(cpus.toInt * 4)
            .write.mode(SaveMode.Overwrite)
            .option("lineSep", " " + delim + " ").text(dir.toString)
          Files.write(dir.resolve("_DONE_RB"), Array.emptyByteArray)
        }
        dir.toString
      } else args(0)

    val bytes = {
      val s = Files.walk(Paths.get(path))
      try s.filter(Files.isRegularFile(_))
        .filter(p => !p.getFileName.toString.startsWith("_"))
        .mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    val gb = bytes / 1e9

    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      // n is sum(length(text)) — total CHARS, not rows; its equality across
      // the two readers is the cheap sanity check that both saw every byte
      println(f"[rb] $tag rep$i $secs%.2f s ${gb / (secs / 3600)}%.1f GB/h ($n chars)")
    }
    time("builtin")(spark.read.option("lineSep", delim).text(path)
      .agg(sum(length(col("value")))).head().getLong(0))
    val chunksMb = sys.env.getOrElse("RB_CHUNKS_MB", "8,64")
      .split(",").toSeq.map(_.trim.toLong)
    for (mb <- chunksMb)
      time(s"dsv2-${mb}mb")(spark.read.format("vspace-corpus")
        .option("chunkBytes", (mb << 20).toString).load(path)
        .agg(sum(length(col("text")))).head().getLong(0))
    spark.stop()
  }
}
