package graft.tools

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Within-window PAIRED probe of the pipeline's dominant stage — near-dup
  * candidate generation (band keys → one bucket-keyed shuffle →
  * collect_capped groups → in-row pair expansion → distinct) — built
  * because whole-pipeline A/B legs on this box are adjudicated by windows,
  * not code: the box shows multi-minute co-tenant arcs (CPU steal visible
  * to the canary, disk contention invisible to it), so two 11-minute legs
  * hours apart measure two windows. This tool times the VARIANTS
  * INTERLEAVED in one JVM against one cached survivor frame, so every
  * comparison is within-window and the rep structure (ABC ABC ...) cancels
  * drift; a serial canary is recorded after every lap.
  *
  * Variants:
  *  - `conf`:  the r14 shape — band keys repartitioned at the SESSION conf
  *             (corpus-sized, ~128/GB), keys (band, bh)
  *  - `sized`: band-key-frame-sized partitioning (the r15 default in
  *             DataPipelineBench), keys (band, bh)
  *  - `bh`:    `sized` plus the band column DROPPED from the shuffled row —
  *             bh is already band-seeded (xxhash64_seeded(1000+b, ...)), so
  *             keying by bh alone merges buckets only on a 64-bit
  *             cross-band collision (~1e-19/pair-of-buckets; a merged
  *             bucket only ADDS candidates, which exact verification
  *             discards — same accepted class as every hashed key).
  *             25% fewer bytes through the exchange (24 vs 32 B UnsafeRow).
  *
  * Usage: runMain graft.tools.CandsLap [targetGB] [reps] — the corpus must
  * already exist (DataPipelineBench GENONLY). Prints one JSON line and
  * persists it via BenchOut ("candslap").
  */
object CandsLap {

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
      .appName("graft-cands-lap")
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

    // pipeline stages 1-3 (scan/score -> quality -> exact dedup), exactly
    // the DataPipelineBench shapes, down to the survivor frame every
    // variant consumes
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

    val nBandRows = nExact * graft.operators.MinHash.NumBands
    val confParts = shufflePartitions
    val sizedParts = math.max(spark.sparkContext.defaultParallelism,
      (nBandRows * 32L / (128L << 20)).toInt + 1)

    def candsOf(variant: String): DataFrame = {
      val bk = graft.operators.MinHash.bandKeys(docsText, "text", Seq("doc_id"))
      variant match {
        case "conf" =>
          graft.operators.MinHash.bucketPairs(
            bk.repartition(confParts, col("band"), col("bh")),
            Seq("band", "bh"), "doc_id")
        case "sized" =>
          graft.operators.MinHash.bucketPairs(
            bk.repartition(sizedParts, col("band"), col("bh")),
            Seq("band", "bh"), "doc_id")
        case "bh" =>
          graft.operators.MinHash.bucketPairs(
            bk.select(col("doc_id"), col("bh"))
              .repartition(confParts, col("bh")),
            Seq("bh"), "doc_id")
        case "bloom" =>
          // two-pass: pass 1 shuffles bh ALONE (16 B rows) to find keys
          // held by >= 2 docs — the only keys that can pair — and folds
          // them into a Bloom filter; pass 2 recomputes the band keys
          // map-side and shuffles only probably-hot rows. False positives
          // leak singletons that pair with nothing; false negatives are
          // impossible — candidate set identical by construction (the
          // count assert below enforces it).
          val hot = bk.select(col("bh"))
            .groupBy(col("bh")).agg(count(lit(1)).as("n"))
            .filter(col("n") >= lit(2L)).select(col("bh"))
          val bloom = hot.stat.bloomFilter("bh", math.max(1000L, nExact), 0.01)
          val bc = spark.sparkContext.broadcast(bloom)
          graft.operators.MinHash.bucketPairs(
            bk.select(col("doc_id"), col("bh"))
              .filter(graft.functions.bloom_might_contain_long(bc, col("bh")))
              .repartition(spark.sparkContext.defaultParallelism, col("bh")),
            Seq("bh"), "doc_id")
        case "oph" =>
          // the `bh` staging with ONE-PERMUTATION signatures — a different
          // LSH family (one bin-route per shingle instead of 64 seeded
          // hashes), so its candidate COUNT legitimately differs from the
          // k-family variants and is excluded from the equality witness
          graft.operators.MinHash.bucketPairs(
            graft.operators.MinHash
              .bandHashKeysOph(docsText, "text", Seq("doc_id"))
              .repartition(confParts, col("bh")),
            Seq("bh"), "doc_id")
        case "mapfam" =>
          // map-side-only probe: evaluate every k-family band hash through
          // a partial aggregate (no group shuffle) — isolates the
          // signature-build CPU share of the stage. Count = 1 row.
          graft.operators.MinHash.bandHashKeys(docsText, "text", Seq("doc_id"))
            .agg(sum(col("bh")).as("s"), count(lit(1)).as("n"))
        case "mapoph" =>
          graft.operators.MinHash.bandHashKeysOph(docsText, "text", Seq("doc_id"))
            .agg(sum(col("bh")).as("s"), count(lit(1)).as("n"))
      }
    }
    // variants whose candidate sets are bit-identical by construction —
    // the count-equality assert (the live no-cross-band-collision / no-
    // false-negative witness) applies within this group only
    val comparable = Set("conf", "sized", "bh", "bloom", "bandbh")

    // run 1 (r15, 11.32 GB, reps 2) measured `sized` 22% SLOWER than
    // `conf` (267.5 vs 218.7 s, clean canaries) — the partition-count
    // hypothesis is refuted; variants since then target BYTES:
    // SPARK_GRAFT_CANDSLAP_VARIANTS overrides the comma-separated list.
    val variants = sys.env.get("SPARK_GRAFT_CANDSLAP_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("conf", "bh", "bloom"))
    val laps = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    graft.HostCanary.sec(); graft.HostCanary.parSec() // JIT-warm
    val cPre = graft.HostCanary.sec()
    (1 to reps).foreach { _ =>
      variants.foreach { v =>
        val t0 = System.nanoTime()
        val n = candsOf(v).distinct().count()
        val secs = (System.nanoTime() - t0) / 1e9
        counts.get(v).foreach(prev => require(prev == n,
          s"variant $v count changed across reps: $prev vs $n"))
        counts(v) = n
        // reap the lap's ~25 GB of dead shuffle files before the next lap
        // (same rationale as the pipeline's per-stage gc)
        System.gc(); Thread.sleep(2000)
        val c = graft.HostCanary.sec()
        laps += ((v, secs, c))
        println(f"[candslap] $v: $secs%.1f s (n=$n, canary=$c%.3f, " +
          f"free=${new java.io.File("/").getFreeSpace / 1e9}%.0f GB)")
      }
    }
    // the bh/bloom variants key by bh ALONE; equality here is the live
    // witness that band-seeded hashes never cross-band-collide on this
    // corpus (and that Bloom false positives leaked no pairs)
    val comparableCounts = counts.filter { case (k, _) => comparable(k) }
    require(comparableCounts.values.toSet.size <= 1,
      s"equivalent variants disagree on candidate count: $comparableCounts")
    val lapsJson = laps.map { case (v, s, c) =>
      f"""{"variant":"$v","secs":$s%.1f,"canary":$c%.3f}""" }.mkString("[", ",", "]")
    val countsJson = counts.map { case (k, n) => s""""$k":$n""" }.mkString("{", ",", "}")
    val summary = f"""{"metric":"candslap","gb":$gb%.3f,"reps":$reps,"conf_parts":$confParts,"sized_parts":$sizedParts,"n_exact":$nExact,"canary_pre":$cPre%.3f,"loadavg":${graft.HostCanary.loadAvg()}%.1f,"counts":$countsJson,"laps":$lapsJson}"""
    println(summary)
    graft.BenchOut.writeSummary("candslap", summary)
    spark.stop()
  }
}
