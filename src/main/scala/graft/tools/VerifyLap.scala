package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Within-window PAIRED probe of the pipeline's exact-verification stage.
  *
  * Motivation: at the r15 scale points the verify stage grew 2.77x at
  * 2.03x data (44.1 s at 11.32 GB -> 122.3 s at 23.01 GB) — the only
  * super-linear stage left — and its plan has a corpus-proportional term:
  * the shingle-hash frame `sh` is computed AND SHUFFLED for every
  * surviving document, yet the verification join consumes only the docs
  * that appear in >= 1 candidate pair (the "participants", ~40-50% of
  * survivors at these scales and far less at lower dup rates). Everything
  * else in the stage is candidate-proportional.
  *
  * Variants (interleaved in one JVM against one checkpointed survivor +
  * candidate frame, serial canary after every lap — the CandsLap
  * instrument, because whole-leg A/Bs on this box measure windows):
  *  - `all`:   the r14/r15 shape — `sh` over the full survivor frame.
  *  - `bloom`: participant prefilter — one pass over the (already
  *             materialized) candidate pairs collects the distinct
  *             participant ids into a broadcast Bloom filter, and the
  *             survivor frame is filtered MAP-SIDE before shingling, so
  *             only (participants + fp) shingle arrays are computed and
  *             shuffled. False positives cost one wasted array each (the
  *             inner join drops them); false negatives are impossible, so
  *             the verified pair set is IDENTICAL by construction — the
  *             cross-variant count assert below is the live witness.
  *
  * Usage: runMain graft.tools.VerifyLap [targetGB] [reps] — corpus must
  * exist (DataPipelineBench GENONLY). One JSON line via BenchOut
  * ("verifylap").
  */
object VerifyLap {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val targetGB = if (args.length > 0) args(0).toDouble else 2.0
    val reps     = if (args.length > 1) args(1).toInt else 2
    val workDir  = if (args.length > 2) args(2) else "target/dpbench"
    val cpus     = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)

    val shufflePartitions = math.max(cpus.toInt, (targetGB * 128).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("graft-verify-lap")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.rdd.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tag = f"${targetGB}%.2f".replace('.', 'p')
    val in = Paths.get(s"$workDir/in_$tag")
    require(java.nio.file.Files.exists(in.resolve("_DONE")),
      s"corpus missing at $in — run DataPipelineBench GENONLY first")
    val corpus = spark.read.parquet(in.resolve("docs").toString)
    val gb = corpus.agg(sum(length(col("text")))).head().getLong(0) / 1e9

    // pipeline stages 1-3, exactly the DataPipelineBench shapes
    import graft.functions.normalize_text
    val scored = corpus
      .select(col("doc_id"), col("source"),
        normalize_text(col("text")).as("text"))
      .select(col("doc_id"), col("source"), col("text"),
        split(col("text"), " ").as("toks"),
        md5(col("text")).as("digest"))
      .select(col("doc_id"), col("source"), col("text"), col("digest"),
        size(col("toks")).as("wc"),
        (size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("diversity"))
      .withColumn("quality",
        least(col("wc") / 100.0, lit(1.0)) * 0.5 + col("diversity") * 0.5)
      .filter(col("quality") >= 0.3 && col("wc") >= 5)
    val exactSurvivors = scored
      .groupBy(col("digest"))
      .agg(min_by(struct(scored.columns.map(col): _*), col("doc_id")).as("__r"))
      .select(col("__r.*"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val nExact = exactSurvivors.count()
    val docsText = exactSurvivors.select(col("doc_id"), col("text"))

    // candidate generation ONCE, the pipeline's bh default staging; every
    // verify variant consumes this one checkpointed pair frame
    val cands = graft.operators.MinHash.bucketPairs(
        graft.operators.MinHash.bandHashKeys(docsText, "text", Seq("doc_id"))
          .repartition(shufflePartitions, col("bh")),
        Seq("bh"), "doc_id")
      .distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val nCands = cands.count()

    val participants = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val nParticipants = participants.count()
    println(f"[verifylap] exact=$nExact cands=$nCands " +
      f"participants=$nParticipants (${100.0 * nParticipants / nExact}%.1f%% of survivors)")

    def verifiedOf(variant: String): DataFrame = {
      val base = variant match {
        case "bloom" =>
          val bloom = participants.stat.bloomFilter("doc_id",
            math.max(1000L, nParticipants), 0.01)
          val bc = spark.sparkContext.broadcast(bloom)
          docsText.filter(graft.functions.bloom_might_contain_long(bc, col("doc_id")))
        case _ => docsText
      }
      val sh = base.select(col("doc_id"),
        array_distinct(graft.functions.word_ngram_hashes(
          split(col("text"), " "), 3,
          graft.operators.MinHash.VerifyHashSeed)).as("sh"))
      cands
        .select(col("id_a"), col("id_b"),
          explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .join(sh, "doc_id")
        .groupBy(col("id_a"), col("id_b"))
        .agg(max(when(col("doc_id") === col("id_a"), col("sh"))).as("sh_a"),
          max(when(col("doc_id") === col("id_b"), col("sh"))).as("sh_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.set_jaccard_hashes(col("sh_a"), col("sh_b")).as("jac"))
        .filter(col("jac") >= 0.7)
    }

    val variants = sys.env.get("SPARK_GRAFT_VERIFYLAP_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("all", "bloom"))
    val laps = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    graft.HostCanary.sec(); graft.HostCanary.parSec() // JIT-warm
    val cPre = graft.HostCanary.sec()
    (1 to reps).foreach { _ =>
      variants.foreach { v =>
        val t0 = System.nanoTime()
        val n = verifiedOf(v).count()
        val secs = (System.nanoTime() - t0) / 1e9
        counts.get(v).foreach(prev => require(prev == n,
          s"variant $v count changed across reps: $prev vs $n"))
        counts(v) = n
        System.gc(); Thread.sleep(2000)
        val c = graft.HostCanary.sec()
        laps += ((v, secs, c))
        println(f"[verifylap] $v: $secs%.1f s (pairs=$n, canary=$c%.3f, " +
          f"free=${new java.io.File("/").getFreeSpace / 1e9}%.0f GB)")
      }
    }
    // bloom prefilter has zero false negatives — pair-set equality across
    // variants is enforced, not assumed
    require(counts.values.toSet.size == 1,
      s"variants disagree on verified pair count: $counts")
    val lapsJson = laps.map { case (v, s, c) =>
      f"""{"variant":"$v","secs":$s%.1f,"canary":$c%.3f}""" }.mkString("[", ",", "]")
    val countsJson = counts.map { case (k, n) => s""""$k":$n""" }.mkString("{", ",", "}")
    val summary = f"""{"metric":"verifylap","gb":$gb%.3f,"reps":$reps,"n_exact":$nExact,"n_cands":$nCands,"n_participants":$nParticipants,"canary_pre":$cPre%.3f,"loadavg":${graft.HostCanary.loadAvg()}%.1f,"counts":$countsJson,"laps":$lapsJson}"""
    println(summary)
    graft.BenchOut.writeSummary("verifylap", summary)
    spark.stop()
  }
}
