package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Within-window PAIRED probe of the pipeline's two remaining
  * corpus-text exchanges — exact dedup (stage 3) and near-dup keep-best
  * (stage 4's survivor materialization) — timing each stage's stagings
  * INTERLEAVED in one JVM against one cached input frame, the CandsLap
  * protocol (whole-pipeline legs on this box measure windows, not code;
  * rep structure ABC ABC cancels drift, a serial canary is recorded after
  * every lap, and a live checksum proves the stagings result-identical at
  * scale, not just at unit scale).
  *
  * Exact-dedup variants (input: the qualified frame, checkpointed SER):
  *  - `ex_agg`:   one digest-keyed full-row min_by shuffle (the default)
  *  - `ex_bloom`: digest-hash count prefilter — provably-unique rows
  *                bypass the exchange map-side (DataPipelineBench.exactDedup)
  *
  * Keep-best variants (input: exact survivors + the verified cluster
  * assignment, both precomputed ONCE outside the laps):
  *  - `kb_anti`:  one doc_id-keyed anti-join of the text frame vs losers
  *  - `kb_bloom`: losers Bloom prefilter — provably-kept rows bypass the
  *                exchange map-side (DataPipelineBench.nearKeepBest)
  *  - `kb_union`: the r14 two-exchange witness (anti UNION semi) — its
  *                r15 session-1 big-leg A/B was window-confounded; this
  *                lap adjudicates it within-window
  *
  * Every lap materializes its survivors exactly as the pipeline does
  * (eager localCheckpoint at MEMORY_AND_DISK_SER) so the timed work is
  * the stage's real bill, then records count + an order-independent
  * checksum (bit_xor of xxhash64(doc_id, digest)) asserted equal across
  * all variants of a group and all reps.
  *
  * Usage: runMain graft.tools.DedupLap [targetGB] [reps] — corpus must
  * already exist (DataPipelineBench GENONLY). One JSON line via BenchOut
  * ("deduplap").
  */
object DedupLap {

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
      .appName("graft-dedup-lap")
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

    // pipeline stages 1-2 (scan/score -> quality), checkpointed SER as the
    // shared input every exact-dedup lap consumes
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
    val qualified = scored.filter(col("quality") >= 0.3 && col("wc") >= 5)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val nQualified = qualified.count()

    // exact survivors + cluster assignment computed ONCE (the bh candidate
    // staging + Bloom-prefiltered hashed verify + CC — the pipeline
    // defaults); every keep-best lap consumes these two cached frames
    val exactSurvivors = DataPipelineBench
      .exactDedup(spark, qualified, "agg", nQualified / 2)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val nExact = exactSurvivors.count()
    val docsText = exactSurvivors.select(col("doc_id"), col("text"))
    val cands = graft.operators.MinHash.bucketPairs(
        graft.operators.MinHash.bandHashKeys(docsText, "text", Seq("doc_id"))
          .repartition(shufflePartitions, col("bh")),
        Seq("bh"), "doc_id")
      .distinct()
      .localCheckpoint()
    val nCands = cands.count()
    val participants = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val nParticipants = participants.count()
    val pBloom = spark.sparkContext.broadcast(participants.stat
      .bloomFilter("doc_id", math.max(1000L, nParticipants), 0.01))
    val sh = docsText
      .filter(graft.functions.bloom_might_contain_long(pBloom, col("doc_id")))
      .select(col("doc_id"),
        array_distinct(graft.functions.word_ngram_hashes(
          split(col("text"), " "), 3,
          graft.operators.MinHash.VerifyHashSeed)).as("sh"))
    val pairs = cands
      .select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .join(sh, "doc_id")
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(when(col("doc_id") === col("id_a"), col("sh"))).as("sh_a"),
        max(when(col("doc_id") === col("id_b"), col("sh"))).as("sh_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.set_jaccard_hashes(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.7)
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint()
    val nPairs = pairs.count()
    cands.unpersist()
    val ccParts = math.max(spark.sparkContext.defaultParallelism,
      (nPairs / 2000000L).toInt + 1)
    val clusters = graft.operators.Dedup
      .connectedComponents(pairs, numPartitions = Some(ccParts))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .localCheckpoint()
    val nClusters = clusters.count()
    pairs.unpersist()
    println(s"[deduplap] qualified=$nQualified exact=$nExact cands=$nCands " +
      s"pairs=$nPairs cluster_rows=$nClusters")

    def survivorsOf(variant: String): (DataFrame, () => Unit) = variant match {
      case "ex_agg" =>
        (DataPipelineBench.exactDedup(spark, qualified, "agg",
          nQualified / 2), () => ())
      case "ex_bloom" =>
        (DataPipelineBench.exactDedup(spark, qualified, "bloom",
          nQualified / 2), () => ())
      case "kb_anti" =>
        DataPipelineBench.nearKeepBest(spark, exactSurvivors, clusters, "anti")
      case "kb_bloom" =>
        DataPipelineBench.nearKeepBest(spark, exactSurvivors, clusters, "bloom")
      case "kb_union" =>
        DataPipelineBench.nearKeepBest(spark, exactSurvivors, clusters, "union")
    }

    val variants = sys.env.get("SPARK_GRAFT_DEDUPLAP_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("ex_agg", "ex_bloom", "kb_anti", "kb_bloom", "kb_union"))
    val laps = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val sums = scala.collection.mutable.LinkedHashMap[String, Long]()
    graft.HostCanary.sec(); graft.HostCanary.parSec() // JIT-warm
    val cPre = graft.HostCanary.sec()
    (1 to reps).foreach { _ =>
      variants.foreach { v =>
        val t0 = System.nanoTime()
        val (plan, cleanup) = survivorsOf(v)
        // materialize exactly as the pipeline does: eager SER checkpoint
        val mat = plan.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        val n = mat.count()
        val secs = (System.nanoTime() - t0) / 1e9
        cleanup()
        // order-independent set checksum (outside the timed region): the
        // live witness that every staging kept EXACTLY the same rows
        val chk = mat.agg(expr(
          "bit_xor(xxhash64(doc_id, digest))").as("x")).head().getLong(0)
        mat.unpersist()
        counts.get(v).foreach(prev => require(prev == n,
          s"variant $v count changed across reps: $prev vs $n"))
        counts(v) = n
        sums.get(v).foreach(prev => require(prev == chk,
          s"variant $v checksum changed across reps"))
        sums(v) = chk
        System.gc(); Thread.sleep(2000)
        val c = graft.HostCanary.sec()
        laps += ((v, secs, c))
        println(f"[deduplap] $v: $secs%.1f s (n=$n, chk=$chk%016x, " +
          f"canary=$c%.3f, free=${new java.io.File("/").getFreeSpace / 1e9}%.0f GB)")
      }
    }
    // within-group equality: the checksum assert is the scale witness that
    // the Bloom stagings (and the union witness) are result-identical
    Seq("ex_", "kb_").foreach { g =>
      val inGroup = counts.keys.filter(_.startsWith(g)).toSeq
      require(inGroup.map(counts).toSet.size <= 1 &&
        inGroup.map(sums).toSet.size <= 1,
        s"group $g stagings disagree: counts=${inGroup.map(k => k -> counts(k))} " +
        s"checksums=${inGroup.map(k => k -> sums(k))}")
    }
    val lapsJson = laps.map { case (v, s, c) =>
      f"""{"variant":"$v","secs":$s%.1f,"canary":$c%.3f}""" }.mkString("[", ",", "]")
    val countsJson = counts.map { case (k, n) => s""""$k":$n""" }.mkString("{", ",", "}")
    val summary = f"""{"metric":"deduplap","gb":$gb%.3f,"reps":$reps,"n_qualified":$nQualified,"n_exact":$nExact,"n_pairs":$nPairs,"n_cluster_rows":$nClusters,"canary_pre":$cPre%.3f,"loadavg":${graft.HostCanary.loadAvg()}%.1f,"counts":$countsJson,"laps":$lapsJson}"""
    println(summary)
    graft.BenchOut.writeSummary("deduplap", summary)
    spark.stop()
  }
}
