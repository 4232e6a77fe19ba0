package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end LLM TRAINING-DATA pipeline benchmark — the composition the
  * extension surface exists for, run as ONE job over a GB-scale corpus:
  *
  *   read → normalize → quality filter → exact dedup (digest groupBy)
  *   → near-dup dedup (MinHash LSH → verify → connected components →
  *   keep best quality) → benchmark decontamination (7-gram hash
  *   semi-join) → train/val split → partitioned parquet write
  *
  * Reports GB/hour over the text bytes plus per-stage survivor counts, so
  * a run is self-validating against the synthesized duplicate mix.
  *
  * The corpus is synthesized from the harness documents with a CONTROLLED
  * duplicate structure (each 5-copy group holds: a base, an exact
  * duplicate, a near-duplicate, and two salted unique variants), so exact
  * dedup, LSH near-dup, and cluster resolution all do real work at
  * realistic rates (~20% exact, ~20% near) with bounded cluster sizes —
  * the shape a web-scale ingest actually sees, scaled down.
  *
  * Usage: runMain graft.tools.DataPipelineBench [targetGB] [workDir]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR (doc source), SPARK_DRIVER_MEM.
  */
object DataPipelineBench {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // dot-decimal JSON under any host locale
    val targetGB = if (args.length > 0) args(0).toDouble else 2.0
    val workDir  = if (args.length > 1) args(1) else "target/dpbench"
    val cpus     = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val sfDir    = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // shuffle partitions track data volume (the ThroughputBench sizing
    // note): the band-key and verification shuffles carry corpus-order
    // bytes, and ~128 partitions/GB keeps a task's slice ~100 MB
    val shufflePartitions = math.max(cpus.toInt, (targetGB * 128).toInt)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("graft-data-pipeline")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // Serialized checkpoint blocks compress only when this is on (it is
      // NOT Spark's default); it pairs with the MEMORY_AND_DISK_SER
      // checkpoint default below. Overridable via SPARK_GRAFT_CONF (env
      // confs apply after, last write wins).
      .config("spark.rdd.compress", "true")
    // extra confs from env (Probe's convention), e.g.
    // SPARK_GRAFT_CONF="spark.rdd.compress=false" for storage-lever A/Bs
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tag = f"${targetGB}%.2f".replace('.', 'p')
    val in  = Paths.get(s"$workDir/in_$tag")
    // `planted` missing ⇒ a corpus from the pre-fix generator (round 12's
    // planting bug, or no ground truth persisted) — regenerate
    if (!Files.exists(in.resolve("_DONE")) ||
        !Files.exists(in.resolve("planted")))
      generate(spark, sfDir, in, targetGB, cpus.toInt)
    // SPARK_GRAFT_DP_GENONLY=1: synthesize the corpus and exit, so the
    // measured run starts against a SETTLED corpus in a separate JVM —
    // generating minutes before the run leaves the corpus parquet in
    // page-cache write-back and was measured to inflate the exact-dedup
    // stage 315.5 vs 259.4 s at the 14.4 GB point.
    if (sys.env.get("SPARK_GRAFT_DP_GENONLY").contains("1")) {
      println(s"[dp] generate-only: corpus ready at $in")
      spark.stop(); return
    }
    val baseCorpus = spark.read.parquet(in.resolve("docs").toString)
    val benchmark = spark.read.parquet(in.resolve("bench").toString)
    val planted = spark.read.parquet(in.resolve("planted").toString)
    val nPlanted = planted.count()

    // SPARK_GRAFT_DP_HOTKEY=N: hot-key stress — plant N near-identical
    // boilerplate rows (one shared base text + a per-row unique tail token).
    // Distinct digests survive exact dedup; the shared base makes most of
    // the 32 band keys COLLIDE across all N rows, so bucketPairs sees ~30
    // (band, bh) buckets of ~N rows each — the exact shape that OOMs an
    // unbounded collect_list and that collect_capped bounds at cap+1
    // elements of state. Self-validating: the run must complete with the
    // cap listener logging the dropped buckets, the verified-pair count
    // unchanged vs the unplanted run (tail shingles are row-unique, so hot
    // rows only ever collide in DROPPED buckets and produce no pairs), and
    // every stage count shifted by exactly +N.
    val hotKeyRows = sys.env.get("SPARK_GRAFT_DP_HOTKEY").map(_.toLong).getOrElse(0L)
    val corpus =
      if (hotKeyRows <= 0) baseCorpus
      else {
        // The shared base is SYNTHESIZED from tokens guaranteed absent from
        // the corpus (an earlier revision sampled a real corpus document,
        // whose own buckets — and therefore its GENUINE near-dup pairs —
        // went hot and were capped away, spuriously breaking the
        // "verified pairs unchanged" invariant below). 64 unique synthetic
        // tokens give the planted rows a full shingle set that collides
        // only among themselves.
        val baseText = (0 until 64).map(i => s"zzhotkeybase$i").mkString(" ")
        val maxId = baseCorpus.agg(max(col("doc_id"))).head().getLong(0)
        baseCorpus.unionByName(
          spark.range(hotKeyRows).select(
            (col("id") + maxId + 1L).as("doc_id"),
            lit("hotkey").as("source"),
            concat(lit(baseText), lit(" h"), col("id")).as("text")))
      }
    val gb = corpus.agg(sum(length(col("text")))).head().getLong(0) / 1e9

    val outDir = s"$workDir/out_$tag"
    graft.HostCanary.sec(); graft.HostCanary.parSec() // JIT-warm
    val cPre  = graft.HostCanary.sec()
    val pcPre = graft.HostCanary.parSec()
    val t0 = System.nanoTime()
    // per-stage laps persist in the artifact (round-13 lesson: the 3x/6x
    // stage table — the round's key scale evidence — lived only in SURVEY
    // prose and stdout)
    val stageSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    // Storage level for the corpus-sized stage checkpoints.
    // MEMORY_AND_DISK_SER (+ spark.rdd.compress above) is the DEFAULT
    // since the round-14 paired A/B on identical corpora: serialized+
    // compressed rows won EVERY stage measured — exact dedup 130.8 ->
    // 42.2 s (3.1x) and +13% end-to-end at 11.32 GB — and completed the
    // 17.35 GB point (55.85 GB/h) where the deserialized default died on
    // ENOSPC in the verify stage twice (deserialized text frames are
    // ~3x larger on disk, and 2 live corpus copies while a third
    // materializes outgrow the volume). The same lever applies per
    // executor on a cluster. SPARK_GRAFT_CKPT_LEVEL=deserialized selects
    // the deserialized witness leg (Spark's own localCheckpoint default;
    // the historical alias `default` — the selector name through round 14,
    // where artifacts' ckpt_level:"default" MEANS deserialized — is still
    // accepted but re-reported as "deserialized" so cross-round artifact
    // comparison has one name per level from here on). Any other value
    // names a StorageLevel.
    val ckptLevelName0 = sys.env.get("SPARK_GRAFT_CKPT_LEVEL")
      .map(_.trim).filter(_.nonEmpty).getOrElse("MEMORY_AND_DISK_SER")
    val ckptLevelName =
      if (ckptLevelName0.equalsIgnoreCase("default")) "deserialized"
      else ckptLevelName0
    val ckptLevel =
      if (ckptLevelName.equalsIgnoreCase("deserialized")) None
      else Some(StorageLevel.fromString(ckptLevelName))
    val counts = run(spark, corpus, benchmark, outDir, Some(planted),
      lapSink = (s, t) => stageSecs(s) = t, ckptLevel = ckptLevel)
    val secs   = (System.nanoTime() - t0) / 1e9
    val cPost  = graft.HostCanary.sec()
    val pcPost = graft.HostCanary.parSec()
    val gbPerHr = gb / (secs / 3600.0)

    // canary/par_canary pre/post: host-health context bracketing the run
    // (dual protocol — serial catches whole-JVM freezes, parallel catches
    // co-tenant capacity steal) — see graft.HostCanary
    val countsJson = counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val stagesJson = stageSecs
      .map { case (k, v) => f""""$k":$v%.1f""" }.mkString("{", ",", "}")
    // candidate-gate inputs computed BEFORE the summary so the gate values
    // persist in the artifact (a 12x reproducer reads its band from here)
    val cm = counts.toMap
    val docsIn = cm.getOrElse("docs_in", 0L)
    val nCands = cm.getOrElse("near_candidates", 0L)
    val candGroups = math.max(1L, (docsIn - hotKeyRows) / 5)
    val candPerGroup = nCands.toDouble / candGroups
    val candGateMax = (3.5 + 0.6 * math.max(0.0,
      math.log(docsIn / 19.1e6) / math.log(2.0))) * 1.5
    val ckptLevelStr = ckptLevelName
    val verifyModeStr = sys.env.getOrElse("SPARK_GRAFT_DP_VERIFY", "hashed")
    val candsModeStr = sys.env.getOrElse("SPARK_GRAFT_DP_CANDS", "bh")
    val verifyPreStr = sys.env.getOrElse("SPARK_GRAFT_DP_VERIFYPRE", "bloom")
    val sigStr = sys.env.getOrElse("SPARK_GRAFT_DP_SIG", "family")
    val exactStr = sys.env.getOrElse("SPARK_GRAFT_DP_EXACT", "agg")
    val keepBestStr = sys.env.getOrElse("SPARK_GRAFT_DP_KEEPBEST", "bloom")
    val outCodecStr = sys.env.getOrElse("SPARK_GRAFT_DP_OUTCODEC", "zstd")
    // heap provenance: the single-JVM local-mode heap (build.sbt -Xmx via
    // SPARK_DRIVER_MEM) bounds concurrent block materialization — at 32
    // threads x few-hundred-MB SER checkpoint blocks the default 8g OOMs
    // at GB scale, so scale runs set it explicitly; record what this run had
    val heapGb = Runtime.getRuntime.maxMemory() / 1e9
    // conf provenance: SPARK_GRAFT_CONF injections (e.g. the io-codec A/B
    // legs) change what the run measures without touching any mode env —
    // persist them so every artifact names its non-default confs
    val confExtra = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .replace("\\", "").replace("\"", "")
    val summary = f"""{"metric":"pipeline","gb":$gb%.3f,"secs":$secs%.1f,"gb_per_hour":$gbPerHr%.2f,"cores":$cpus,"heap_gb":$heapGb%.1f,"conf_extra":"$confExtra","ckpt_level":"$ckptLevelStr","verify":"$verifyModeStr","cands":"$candsModeStr","verify_pre":"$verifyPreStr","sig":"$sigStr","exact":"$exactStr","keepbest":"$keepBestStr","outcodec":"$outCodecStr","hotkey_rows":$hotKeyRows,"planted":$nPlanted,"canary_pre":$cPre%.3f,"canary_post":$cPost%.3f,"par_canary_pre":$pcPre%.3f,"par_canary_post":$pcPost%.3f,"loadavg":${graft.HostCanary.loadAvg()}%.1f,"cand_per_group":$candPerGroup%.2f,"cand_gate_max":$candGateMax%.2f,"stage_secs":$stagesJson,$countsJson}"""
    println(summary)
    System.out.flush()
    graft.BenchOut.writeSummary("pipeline-last", summary)

    // SELF-VALIDATION GATE (round-12 lesson: the buggy generator planted
    // ZERO contamination rows, the decontam stage went vacuous, and the
    // run printed plausible counts — `after_decontam == after_near_dedup`
    // — with nothing failing). A run whose planted ground truth is empty,
    // mostly eaten before the decontam stage, or <90% caught BY the
    // decontam stage exits non-zero so the vacuity is loud.
    val atNear  = cm.getOrElse("planted_after_near", 0L)
    val escaped = cm.getOrElse("planted_after_decontam", 0L)
    val caught  = atNear - escaped
    val plantedOk =
      nPlanted > 0 &&
      atNear >= (0.5 * nPlanted).toLong && // generator sanity: planted rows must REACH decontam
      caught >= (0.9 * atNear).toLong
    if (!plantedOk) {
      System.err.println(
        s"[dp] SELF-VALIDATION FAILED: planted=$nPlanted reached_decontam=" +
        s"$atNear caught=$caught escaped=$escaped — decontamination ground " +
        "truth is vacuous or the stage missed >10% of it")
      spark.stop()
      sys.exit(1)
    }
    println(f"[dp] decontam self-validation: planted=$nPlanted reached=" +
      f"$atNear caught=$caught (${100.0 * caught / math.max(1L, atNear)}%.1f%%)")

    // CANDIDATE-COUNT GATE (round-13 finding 4: candidate generation grew
    // mildly super-proportionally — 2.34x pairs at 2x data vs the 2.0x
    // structural — bounded by the banding math but with NO tripwire, so a
    // 12x attempt going quadratic would only be noticed in the wall
    // clock). The generator's structural candidates are one (base, near)
    // pair per 5-group; everything above that is banding noise, measured
    // at 3.5 distinct candidates per group at 19.1M docs and 4.1 at 38.3M
    // (the noise term grows with corpus size as more unique-row band
    // collisions clear the distinct). Model that growth as
    // 3.5 + 0.6*log2(docs/19.1M) per group and fail LOUDLY above 1.5x the
    // model — linear-ish growth passes with margin, quadratic growth
    // (4x candidates at 2x data) trips it. Enforced only in the measured
    // regime (>=5M docs); smaller corpora print the ratio for the record.
    if (docsIn > 0 && nCands > 0) {
      println(f"[dp] candidate self-validation: candidates=$nCands " +
        f"groups=$candGroups per_group=$candPerGroup%.2f " +
        f"gate_max=$candGateMax%.2f")
      if (docsIn >= 5000000L && candPerGroup > candGateMax) {
        System.err.println(
          f"[dp] CANDIDATE GATE FAILED: $candPerGroup%.2f distinct " +
          f"candidates per duplicate group exceeds the banding-noise band " +
          f"($candGateMax%.2f at $docsIn docs) — candidate generation is " +
          "growing super-linearly; re-derive the banding math before " +
          "trusting this scale point")
        spark.stop()
        sys.exit(1)
      }
    }
    spark.stop()
  }

  /** The pipeline itself. `benchmark` is the EXTERNAL held-out evaluation
    * set (never part of the training corpus — the real decontamination
    * shape); docs sharing any 7-gram with it are dropped. Returns
    * per-stage survivor counts (each stage's count comes from the job
    * that produced it — no extra scans except the deliberately
    * materialized stage boundaries).
    *
    * `plantedIds`, when given (doc_id column; the generator's planted
    * contamination ground truth), adds two id-only semi-join counts at
    * the decontamination stage's boundaries — `planted_after_near` (how
    * many planted rows REACHED decontam) and `planted_after_decontam`
    * (how many escaped it) — so the caller can assert the stage actually
    * caught the contamination instead of trusting survivor totals. Both
    * probes run against already-checkpointed frames with a broadcast-
    * small right side: wall cost is seconds against a 20-minute run. */
  def run(spark: SparkSession, corpus: DataFrame, benchmark: DataFrame,
      outDir: String, plantedIds: Option[DataFrame] = None,
      lapSink: (String, Double) => Unit = (_, _) => (),
      ckptLevel: Option[StorageLevel] = None,
      verifyMode: String = sys.env.getOrElse("SPARK_GRAFT_DP_VERIFY", "hashed"),
      keepBestMode: String =
        sys.env.getOrElse("SPARK_GRAFT_DP_KEEPBEST", "bloom"),
      exactMode: String = sys.env.getOrElse("SPARK_GRAFT_DP_EXACT", "agg"),
      candsMode: String = sys.env.getOrElse("SPARK_GRAFT_DP_CANDS", "bh"),
      verifyPre: String = sys.env.getOrElse("SPARK_GRAFT_DP_VERIFYPRE", "bloom"),
      sigScheme: String = sys.env.getOrElse("SPARK_GRAFT_DP_SIG", "family"))
      : Seq[(String, Long)] = {
    import graft.functions.{normalize_text, word_ngrams, xxhash64_seeded}

    // Corpus-sized stage frames checkpoint at `ckptLevel` when given
    // (serialized levels trade ~CPU for 2-3x smaller resident blocks —
    // the lever for the 6x exact-dedup disk cliff); the small id/pair
    // frames keep the deserialized default, where serialization buys
    // nothing and costs per-round CC latency.
    def ckptText(df: DataFrame): DataFrame =
      ckptLevel.map(l => df.localCheckpoint(true, l))
        .getOrElse(df.localCheckpoint())

    var tLast = System.nanoTime()
    def lap(stage: String): Unit = {
      val now = System.nanoTime()
      println(f"[dp] $stage: ${(now - tLast) / 1e9}%.1f s")
      lapSink(stage.trim, (now - tLast) / 1e9)
      tLast = now
      // Shuffle files from completed stages are reaped by the
      // ContextCleaner only when their ShuffleDependency objects are GC'd
      // on the driver; in one long-lived job over a multi-GB corpus the
      // accumulated dead spill was the DISK ceiling (measured: the 3x-size
      // run filled the volume with shuffle files three stages after the
      // shuffles were last referenced). One explicit gc per stage boundary
      // lets the cleaner keep pace; wall cost is milliseconds per stage.
      // NOTE for cluster deployment: Spark ships a CONFIG for exactly this
      // — `spark.cleaner.periodicGC.interval` (default 30min; set it to
      // ~1-5min for long shuffle-heavy jobs). Tune the config there, not
      // the code; the explicit call stays here only because this tool's
      // per-stage laps want deterministic reap points inside ONE job.
      System.gc()
    }

    // --- stage 1: one scan computes everything per-doc and map-side:
    // normalized text, quality metrics, content digest. Persist the compact
    // frame — every later stage starts from it, never from raw text.
    val scored = ckptText(corpus
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
        least(col("wc") / 100.0, lit(1.0)) * 0.5 + col("diversity") * 0.5))
    val nIn = scored.count()
    lap("scan+score")

    // --- stage 2: quality floor (map-side filter on the persisted frame)
    val qualified = scored.filter(col("quality") >= 0.3 && col("wc") >= 5)
    val nQualified = qualified.count()
    lap("quality")

    // --- stage 3: exact dedup (see exactDedup's scaladoc for the two
    // stagings; SPARK_GRAFT_DP_EXACT selects)
    val exactSurvivors = ckptText(
      exactDedup(spark, qualified, exactMode, nQualified / 2))
    val nExact = exactSurvivors.count()
    // Stage-frame lifecycle: each localCheckpoint materializes a
    // corpus-sized frame, and holding every stage's copy to the end means
    // ~5 live corpus copies of block storage (measured as the disk ceiling
    // of the 3x-size run; the same 5x storage bill would be paid by a real
    // cluster's executors). Once the NEXT checkpoint is materialized, the
    // previous stage's frame is dead — nothing re-reads it — so unpersist
    // it and cap live storage at ~2 copies. (Unpersisting a
    // local-checkpointed frame destroys it irrecoverably; safe here
    // precisely because no later stage references it.)
    scored.unpersist()
    lap("exact_dedup")

    // --- stage 4: near-dup dedup on the survivors — band keys map-side,
    // (band, bh) equi-join for candidates, exact-Jaccard verification with
    // shingles rebuilt id-keyed (candidate-proportional), connected
    // components, then keep the BEST-QUALITY member per cluster (the q92
    // policy)
    val docsText = exactSurvivors.select(col("doc_id"), col("text"))
    // NO checkpoint on the band keys: the grouped candidate generator
    // consumes them exactly once, and materializing them here (the old
    // self-join needed it for its two references) cached ~7.5 GB in the
    // 8 GB heap and starved the aggregation's execution memory into a
    // spill-reader OOM at merge time
    // explicit keyCols repartition per bucketPairs' sizing contract: user
    // repartitions are exempt from AQE coalescing, which would size the
    // aggregation exchange by its compact 8-byte-id bytes — blind to the
    // up-to-cap/2x row inflation of the downstream in-row expansion.
    //
    // Partition count: the session conf (corpus-sized). The r15 "size by
    // band-key bytes" hypothesis (~128 MB/task => ~6x fewer partitions)
    // was REFUTED by interleaved same-window laps (CandsLap run 1,
    // 11.32 GB: sized 267.5/286.6 s vs conf 218.7/279.0) — bigger
    // per-task sorts in the aggregation's sort-based fallback cost more
    // than the M x R block-count reduction saves. SPARK_GRAFT_DP_BAND_PARTS:
    // an integer pins it; `sized` selects the refuted formula for probes.
    val nBandRows = nExact * graft.operators.MinHash.NumBands
    val bandParts = sys.env.get("SPARK_GRAFT_DP_BAND_PARTS") match {
      case Some("sized") => math.max(spark.sparkContext.defaultParallelism,
        (nBandRows * 32L / (128L << 20)).toInt + 1)
      case Some(n) if n != "conf" => n.toInt
      case _ => spark.sessionState.conf.numShufflePartitions
    }
    // Candidate staging (SPARK_GRAFT_DP_CANDS):
    //  - `bh` (default): band keys travel as (doc_id, bh) ONLY — the band
    //    ordinal lives inside the seeded hash (MinHash.bandHashKeys), so
    //    the dominant exchange carries 24-byte rows instead of 32 and the
    //    aggregation keys one long. Candidates are bit-identical to the
    //    (band, bh) form modulo an ~1e-19 cross-band collision class that
    //    exact verification discards anyway; measured 1.5x on the stage
    //    (CandsLap run 1).
    //  - `bloom`: two-pass prefilter — pass 1 shuffles bh alone (16-byte
    //    rows) to Bloom the keys with >= 2 docs; pass 2 recomputes band
    //    keys map-side and shuffles only probably-hot rows (the only keys
    //    that can pair; false positives leak pairless singletons, false
    //    negatives are impossible). Candidate set identical by
    //    construction (BloomMightContainSpec).
    //  - `bandbh`: the r14 staging ((band, bh) rows) for paired A/Bs.
    // SPARK_GRAFT_DP_NEARLAP=1 (single-pass modes): materialize the
    // repartitioned band keys so the stage splits into `bands_mat` (build
    // CPU + shuffle) and `group_emit` (aggregation + expansion + distinct).
    // Signature scheme (SPARK_GRAFT_DP_SIG):
    //  - `family` (default): the fused 64-seeded-hash kernel
    //    (minhash_signatures) — 64 XXH64 long-mixes per shingle.
    //  - `oph`: one-permutation + rotation densification
    //    (minhash_signatures_oph) — ONE bin-route per shingle. A different
    //    LSH family, so the candidate SET differs; precision is untouched
    //    (exact verify downstream) and recall is witnessed live by the
    //    planted-dup gate. MEASURED AND REFUTED as a default at 11.32 GB
    //    (candslap-oph-11p3g.json): 131.0 M candidates vs the family's
    //    15.5 M (8.4x, deterministic — short docs densify most slots and
    //    correlate across non-similar docs) and no map-side CPU win
    //    (mapfam 23-27 s vs mapoph 30-33 s). See bandHashKeysOph scaladoc.
    def bandHashKeysOf(df: DataFrame): DataFrame =
      if (sigScheme == "oph")
        graft.operators.MinHash.bandHashKeysOph(df, "text", Seq("doc_id"))
      else graft.operators.MinHash.bandHashKeys(df, "text", Seq("doc_id"))
    println(s"[dp]   near: cands_mode=$candsMode sig=$sigScheme " +
      s"band_parts=$bandParts (rows=$nBandRows)")
    val nearLap = sys.env.get("SPARK_GRAFT_DP_NEARLAP").contains("1")
    var lapFrame: Option[DataFrame] = None
    def lapMat(buckets: DataFrame): DataFrame =
      if (!nearLap) buckets
      else {
        val bmat = buckets.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        lap("  near:cands:bands_mat")
        lapFrame = Some(bmat)
        bmat
      }
    val rawCands = candsMode match {
      case "bandbh" =>
        val buckets = graft.operators.MinHash
          .bandKeys(docsText, "text", Seq("doc_id"))
          .repartition(bandParts, col("band"), col("bh"))
        lap("  near:bands")
        graft.operators.MinHash.bucketPairs(lapMat(buckets),
          Seq("band", "bh"), "doc_id")
      case "bloom" =>
        val bk = bandHashKeysOf(docsText)
        lap("  near:bands")
        val hot = bk.select(col("bh"))
          .groupBy(col("bh")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= lit(2L)).select(col("bh"))
        val bloom = hot.stat.bloomFilter("bh", math.max(1000L, nExact), 0.01)
        val bc = spark.sparkContext.broadcast(bloom)
        lap("  near:cands:bloom")
        // post-filter rows are pair-participant-sized (~candidates x 2),
        // 1000x below the corpus — id-scale partitioning, the CC sizing
        graft.operators.MinHash.bucketPairs(
          bk.filter(graft.functions.bloom_might_contain_long(bc, col("bh")))
            .repartition(math.max(spark.sparkContext.defaultParallelism,
              (nExact / 2000000L).toInt + 1), col("bh")),
          Seq("bh"), "doc_id")
      case _ =>
        val buckets = bandHashKeysOf(docsText)
          .repartition(bandParts, col("bh"))
        lap("  near:bands")
        graft.operators.MinHash.bucketPairs(lapMat(buckets),
          Seq("bh"), "doc_id")
    }
    val cands = rawCands
      .distinct()
      .localCheckpoint()
    val nCands = cands.count()
    if (nearLap) {
      lap("  near:cands:group_emit")
      lapFrame.foreach(_.unpersist())
    }
    println(s"[dp]   near: candidates=$nCands")
    lap("  near:cands")
    // single-reference verification (the lshVerifiedPairs shape): each
    // pair explodes into its two (pair, doc) rows, joins the one shingle
    // frame id-keyed, and regroups — shingles are computed once and only
    // candidates' shingles cross the regroup shuffle. Shingles travel as
    // 8-byte hashes (array_distinct over the fused gram-hash kernel, the
    // decontam/band-key staging): Jaccard over hashed shingle sets equals
    // Jaccard over the shingle strings except on a 64-bit collision
    // (~n²/2⁶⁵ per pair, the accepted class), and the hashed arrays are
    // ~4-5x smaller through the two verify shuffles — this stage was the
    // LAST corpus-derived strings crossing an exchange, and its
    // string-array spill was the ENOSPC at the 23 GB scale point.
    // Hashed with VerifyHashSeed, NOT the band keys' BaseHashSeed, so the
    // exact check's collision class is independent of candidate
    // generation's (a shared seed replays the same collision both times).
    // SPARK_GRAFT_DP_VERIFY=string selects the reference-faithful
    // string-shingle witness leg (the r14 `half` shape) for paired A/Bs;
    // pair sets are bit-identical across the two legs (proven at 11.32 GB,
    // 6,061,337 pairs) — only the shuffle bytes differ.
    //
    // Participant prefilter (SPARK_GRAFT_DP_VERIFYPRE, default `bloom`):
    // the shingle frame below was the stage's one CORPUS-proportional term
    // — computed and shuffled for every survivor, though the join consumes
    // only docs appearing in >= 1 candidate pair (~40-50% of survivors at
    // the r15 scale points, and the stage grew 2.77x at 2.03x data). One
    // pass over the already-checkpointed pair frame collects the distinct
    // participant ids into a broadcast Bloom filter, and survivors are
    // filtered MAP-SIDE before shingling, making the whole stage
    // candidate-proportional. False positives (1%) cost one wasted array
    // each, which the inner join drops; false negatives are impossible, so
    // the verified pair set is IDENTICAL by construction (unit A/B leg in
    // DataPipelineSpec; VerifyLap asserts pair-set counts live at scale).
    // `off` selects the unfiltered r14/r15 witness leg for paired A/Bs.
    var nParticipants = -1L
    val verifyBase =
      if (verifyPre == "bloom" && nCands > 0) {
        val participants = cands
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
        nParticipants = participants.count()
        println(f"[dp]   near: verify participants=$nParticipants " +
          f"(${100.0 * nParticipants / math.max(nExact, 1)}%.1f%% of survivors)")
        val bloom = participants.stat.bloomFilter("doc_id",
          math.max(1000L, nParticipants), 0.01)
        val bc = spark.sparkContext.broadcast(bloom)
        docsText.filter(graft.functions.bloom_might_contain_long(bc, col("doc_id")))
      } else docsText
    val sh =
      if (verifyMode == "string")
        verifyBase.select(col("doc_id"),
          graft.operators.MinHash.shingles(col("text")).as("sh"))
      else
        verifyBase.select(col("doc_id"),
          array_distinct(graft.functions.word_ngram_hashes(
            split(col("text"), " "), 3,
            graft.operators.MinHash.VerifyHashSeed)).as("sh"))
    val jacOf: (Column, Column) => Column =
      if (verifyMode == "string") graft.functions.set_jaccard
      else graft.functions.set_jaccard_hashes
    val pairs = cands
      .select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .join(sh, "doc_id")
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(when(col("doc_id") === col("id_a"), col("sh"))).as("sh_a"),
        max(when(col("doc_id") === col("id_b"), col("sh"))).as("sh_b"))
      .select(col("id_a"), col("id_b"),
        jacOf(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.7)
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint()
    val nPairs = pairs.count()
    println(s"[dp]   near: verified pairs=$nPairs")
    cands.unpersist() // dead once the verified pairs are materialized
    lap("  near:verify")
    // CC partitioning sized by the EDGE frame, not the session conf: the
    // session runs ~128 shuffle partitions per corpus GB for the text
    // stages, but the pair frame is ~1000x smaller — inheriting the
    // session count made every CC round ~1800 near-empty tasks per stage
    // (cached plans are AQE-exempt), measured as 4.5x time at 2x data at
    // the 14.4 GB point. ~2M edges per partition keeps a task's slice of
    // the 16-byte pair rows ~32 MB.
    val ccParts = math.max(spark.sparkContext.defaultParallelism,
      (nPairs / 2000000L).toInt + 1)
    val clusters = graft.operators.Dedup
      .connectedComponents(pairs, numPartitions = Some(ccParts))
      .select(col("id").as("doc_id"), col("cluster_id"))
    pairs.unpersist() // connectedComponents checkpointed its own output
    lap("  near:cc")
    // keep-best survivor stagings live in nearKeepBest (scaladoc there);
    // SPARK_GRAFT_DP_KEEPBEST selects bloom (default) | anti | union
    val (survivorPlan, kbCleanup) =
      nearKeepBest(spark, exactSurvivors, clusters, keepBestMode)
    val nearSurvivors = ckptText(survivorPlan)
    val nNear = nearSurvivors.count()
    kbCleanup()
    exactSurvivors.unpersist() // superseded by nearSurvivors
    lap("near_dedup")

    // --- stage 5: benchmark decontamination — the EXTERNAL benchmark
    // docs contribute their (normalized) 7-gram hashes; a corpus doc
    // sharing ANY hash is dropped. The benchmark side is tiny by contract
    // so its hash set broadcasts and the whole stage is one map-side
    // semi-join probe: text never crosses a shuffle.
    // word_ngram_hashes: bit-equal to exploding the gram STRINGS and
    // hashing them (same XXH64 bytes), but the corpus side skips hundreds
    // of millions of short-lived gram-string allocations
    val heldoutGrams = benchmark
      .select(normalize_text(col("text")).as("text"))
      .select(explode(graft.functions.word_ngram_hashes(
        split(col("text"), " "), 7, 56L)).as("h"))
      .distinct()
    val docGrams = nearSurvivors
      .select(col("doc_id"),
        explode(graft.functions.word_ngram_hashes(
          split(col("text"), " "), 7, 56L)).as("h"))
    val contaminated = docGrams
      .join(broadcast(heldoutGrams), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = ckptText(nearSurvivors
      .join(contaminated, Seq("doc_id"), "left_anti"))
    val nClean = clean.count()
    // planted-contamination probes at this stage's boundaries, while the
    // nearSurvivors frame is still alive (see scaladoc)
    val plantedCounts = plantedIds.map { p =>
      val pb = broadcast(p.select(col("doc_id")))
      Seq(
        "planted_after_near" ->
          nearSurvivors.join(pb, Seq("doc_id"), "left_semi").count(),
        "planted_after_decontam" ->
          clean.join(pb, Seq("doc_id"), "left_semi").count())
    }.getOrElse(Seq.empty)
    nearSurvivors.unpersist() // superseded by clean
    lap("decontam")

    // --- stage 6: split + write (near-dups are gone, so a doc-hash split
    // is leakage-free by construction); partitioned parquet out.
    // Output codec: zstd by default (guide §6) — IoLap 11.32 GB adjudication:
    // clean-window write time equal to snappy (min 5.0 vs 5.7 s), output 32%
    // smaller (2.58 vs 3.81 GB; lz4 4.86), and the smallest worst case under
    // disk contention (71.9 s where snappy read 103.6 in the same window) —
    // at scale the deliverable's bytes are also every downstream reader's
    // scan bytes. `SPARK_GRAFT_DP_OUTCODEC=snappy|lz4` keeps witness legs;
    // row counts are codec-invariant (IoLap asserts read-back equality).
    val outCodec = sys.env.getOrElse("SPARK_GRAFT_DP_OUTCODEC", "zstd")
    val outFrame = clean
      .withColumn("split",
        when(((col("doc_id") % 65536) * 40503L) % 65536 < 6554, "val")
          .otherwise("train"))
      .select(col("doc_id"), col("source"), col("split"),
        col("quality"), col("text"))
    outFrame.write.mode(SaveMode.Overwrite)
      .option("compression", outCodec)
      .partitionBy("split").parquet(outDir)
    lap("split_write")
    // read-back counts lapped separately from the write (the write is the
    // pipeline's deliverable; the counts are self-validation overhead —
    // partition-pruned parquet count scans, metadata-cheap)
    val written = spark.read.parquet(outDir)
    val nTrain = written.filter(col("split") === "train").count()
    val nVal = written.filter(col("split") === "val").count()
    lap("out_count")

    Seq("docs_in" -> nIn, "after_quality" -> nQualified,
      "after_exact_dedup" -> nExact,
      "near_candidates" -> nCands, "near_verified_pairs" -> nPairs,
      "after_near_dedup" -> nNear,
      "after_decontam" -> nClean, "train" -> nTrain, "val" -> nVal,
      "band_parts" -> bandParts.toLong,
      "verify_participants" -> nParticipants) ++
      plantedCounts
  }

  /** Exact-dedup survivor plan over the qualified frame: keep the
    * lowest-id row per content digest. Two stagings, result-identical by
    * construction (`SPARK_GRAFT_DP_EXACT`):
    *
    *  - `agg` (default): fold survivor selection INTO the digest
    *    aggregation (min_by of the whole row) — ONE digest-keyed shuffle,
    *    map-side combined, no join. The pre-r13 shape
    *    (groupBy.agg(min(doc_id)) + a doc_id-keyed LEFT SEMI back against
    *    the text frame) shuffled the FULL-TEXT frame a second time and
    *    went disk-bound at the 14.4 GB point (311 s vs 56 s at 7 GB).
    *    min_by is a DeclarativeAggregate, so partial aggregation applies —
    *    but duplicates are spread randomly across input partitions, so
    *    map-side combine collapses almost nothing and ~the whole corpus
    *    text still crosses the digest exchange.
    *  - `bloom`: participant prefilter (the verify-stage staging applied
    *    here). Pass 1 shuffles an 8-byte digest hash ALONE through a
    *    count aggregation and folds the hashes held by >= 2 rows — the
    *    only digests that can dedup anything (~1 per 5-group in the
    *    synthesized mix; ~20-40% of rows in a web crawl) — into a
    *    broadcast Bloom filter. Pass 2 splits the corpus MAP-SIDE: rows
    *    whose digest hash misses the filter are provably digest-unique
    *    and bypass the exchange entirely; only probably-duplicate rows
    *    shuffle their text through the min_by aggregation. False
    *    positives (1%) ride the aggregation as singleton groups that
    *    min_by keeps unchanged; false negatives are impossible, so the
    *    survivor SET is identical (DataPipelineSpec's A/B leg + the
    *    DedupLap live checksum). The 64-bit digest-hash collision class
    *    (~n²/2⁶⁵ pairs) only ever ADDS a row to the aggregation path —
    *    grouping is by the true digest — so exactness is unconditional.
    *    At 100 TB this is the difference between shuffling the corpus
    *    and shuffling its duplicate fraction. MEASURED AND ADJUDICATED
    *    AGAINST as the default at THIS duplicate mix (deduplap-11p3g.json,
    *    interleaved laps, checksums identical): clean rep 49.6 s vs agg's
    *    19.3 s — with 40% of rows digest-participants, the extra
    *    corpus-wide hash shuffle + Bloom build + double corpus pass cost
    *    more than bypassing 60% of the text saves. The staging inverts at
    *    web-crawl participant fractions (~20%) or when the exchange is
    *    network-bound (cluster) rather than page-cache-local (this box);
    *    the lever records the decision boundary.
    *
    * `expectedDupDigests` sizes the Bloom filter (an upper bound is fine:
    * oversizing only lowers the false-positive rate; 30 M keys at 1% is
    * ~34 MB broadcast). */
  def exactDedup(spark: SparkSession, qualified: DataFrame, mode: String,
      expectedDupDigests: Long): DataFrame = {
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("digest"))
      .agg(min_by(struct(df.columns.map(col): _*), col("doc_id")).as("__r"))
      .select(col("__r.*"))
    mode match {
      case "bloom" =>
        val dupHashes = qualified
          .select(xxhash64(col("digest")).as("dh"))
          .groupBy(col("dh")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= lit(2L)).select(col("dh"))
        val bloom = dupHashes.stat.bloomFilter("dh",
          math.max(1000L, expectedDupDigests), 0.01)
        val bc = spark.sparkContext.broadcast(bloom)
        def mightDup: Column = graft.functions.bloom_might_contain_long(
          bc, xxhash64(col("digest")))
        qualified.filter(!mightDup)
          .unionByName(agg(qualified.filter(mightDup)))
      case _ => agg(qualified)
    }
  }

  /** Near-dup keep-best survivor plan: from the cluster assignment, keep
    * the best-quality member per cluster (lowest id on ties) plus every
    * non-member. Returns (plan, cleanup) — run cleanup after the caller
    * materializes the plan. Stagings (`SPARK_GRAFT_DP_KEEPBEST`), all
    * set-identical (keepBest ⊆ inAnyCluster, so
    * all − (inAnyCluster − keepBest) = non-members ∪ winners):
    *
    *  - `bloom` (default since the r15 DedupLap adjudication): participant
    *    prefilter — the losers id-frame (~cluster members − clusters,
    *    1000x below the corpus) folds into a broadcast Bloom filter; rows
    *    missing it are provably keepers and bypass the exchange MAP-SIDE,
    *    and only probable-losers (the losers plus ~1% false positives)
    *    shuffle text through the anti-join, which drops the true losers
    *    and recovers the false positives. False negatives are impossible,
    *    so the survivor set is identical by construction. Text through
    *    the exchange is loser-proportional instead of corpus-proportional
    *    — the same argument as the verify-stage prefilter. Measured
    *    (deduplap-11p3g.json, interleaved same-JVM laps, checksums
    *    identical): 16.1/17.4 s across reps (±4%) where `anti` swung
    *    68.9/16.9 s — equal clean-window minimum, 4x lower worst case,
    *    and ~4x fewer text bytes through the exchange by construction
    *    (25% of survivors are probable-losers at this mix). (A broadcast
    *    of the EXACT loser id set would skip the recovery join but is
    *    ~13x more bytes per key; at billions of losers neither broadcasts
    *    and this staging degrades to `anti` — flip the mode, the results
    *    are identical.)
    *  - `anti`: losers computed entirely on id-sized frames, then ONE
    *    doc_id-keyed anti-join against the text frame — the full
    *    survivor text crosses that one exchange.
    *  - `union`: the r14 witness shape — (non-members) UNION (semi-join
    *    winners), two corpus-text exchanges; kept for paired A/Bs. */
  def nearKeepBest(spark: SparkSession, exactSurvivors: DataFrame,
      clusters: DataFrame, mode: String): (DataFrame, () => Unit) = {
    val keepBest = clusters
      .join(exactSurvivors.select(col("doc_id"), col("quality")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("m"))
      .select((-col("m.nid")).as("doc_id"))
    val inAnyCluster = clusters.select(col("doc_id"))
    mode match {
      case "union" =>
        (exactSurvivors
          .join(inAnyCluster, Seq("doc_id"), "left_anti")
          .unionByName(
            exactSurvivors.join(keepBest, Seq("doc_id"), "left_semi")),
          () => ())
      case "bloom" =>
        val losers = inAnyCluster.join(keepBest, Seq("doc_id"), "left_anti")
          .localCheckpoint() // referenced twice (Bloom build + recovery join)
        val nLosers = losers.count()
        val bloom = losers.stat.bloomFilter("doc_id",
          math.max(1000L, nLosers), 0.01)
        val bc = spark.sparkContext.broadcast(bloom)
        def mightLose: Column =
          graft.functions.bloom_might_contain_long(bc, col("doc_id"))
        (exactSurvivors.filter(!mightLose)
          .unionByName(exactSurvivors.filter(mightLose)
            .join(losers, Seq("doc_id"), "left_anti")),
          () => losers.unpersist())
      case _ =>
        val losers = inAnyCluster.join(keepBest, Seq("doc_id"), "left_anti")
        (exactSurvivors.join(losers, Seq("doc_id"), "left_anti"), () => ())
    }
  }

  /** Synthesize a ~targetGB parquet corpus with a CONTROLLED duplicate
    * mix, engineered so every cross-row Jaccard sits FAR from the 0.7
    * near-dup threshold. Each source doc expands to `copies` rows in
    * groups of 5:
    *
    * Distinctness everywhere is by SALTING: every 3rd token of the source
    * doc is replaced by a marker, so EVERY 3-token shingle contains a
    * salted position and rows with different salts share no shingles at
    * all — they neither near-dup anything nor band-collide. This is a
    * measured requirement, not taste: a draft that differentiated rows by
    * concatenation (Jaccard ~1/3 vs their components) produced 6-13M
    * band-collision candidates from 81k docs — 32x2 banding is tuned for
    * the 0.7 threshold and floods mid-similarity pairs into the candidate
    * set, so verification dominated the whole pipeline. Unique filler must
    * be shingle-DISJOINT, not merely below-threshold.
    *
    *  - the group BASE = the doc salted with the GROUP marker (stable
    *    within a group, distinct across groups and docs);
    *  - variants 0/1 = the base twice (exact-duplicate pair);
    *  - variant 2 = base + one extra token (near-dup, Jaccard ~0.97);
    *  - variants 3/4 = a gid-rotated doc salted with a PER-ROW marker
    *    (globally unique rows).
    *
    * ~1% of source docs are carved out as the EXTERNAL benchmark set
    * (never synthesized into the corpus), and a HASH-gated ~16 rows per
    * bench doc among the variant-3 uniques get a benchmark doc's text
    * APPENDED — planted contamination the decontamination stage must
    * catch. The planted doc_ids are persisted (`in/planted`) as ground
    * truth; the main() gate fails the run loudly when the decontam stage
    * catches <90% of the planted rows that reach it, or when planting is
    * vacuous (round 12 shipped a 14.4 GB run with ZERO planted rows — a
    * modular-arithmetic clash between the plant step and the variant
    * stride — and nothing noticed).
    *
    * Expected pipeline behavior per 5-group: exact dedup removes 1 row,
    * near-dup dedup removes 1 more (cluster of exactly 2, best quality
    * kept); decontamination then removes ~the planted rows — so the
    * reported counts self-validate against docs_in. */
  private def generate(spark: SparkSession, sfDir: String, in: Path,
      targetGB: Double, cpus: Int): Unit = {
    import org.apache.spark.sql.expressions.Window

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    // ~1% of source docs become the EXTERNAL benchmark set — excluded
    // from synthesis entirely (a real eval set is never in the corpus)
    val bench = all.filter(col("doc_id") % 97 === 0)
    bench.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(in.resolve("bench").toString)
    // densely re-index the remaining docs so the rotation arithmetic
    // below always lands on an existing row (source doc_ids may be
    // sparse after the benchmark carve-out)
    val docs = all.filter(col("doc_id") % 97 =!= 0)
      .withColumn("idx",
        row_number().over(Window.orderBy(col("doc_id"))).cast("long") - 1)
      .select(col("idx"), col("source"), col("text"))
      .localCheckpoint()
    val stats = docs.agg(count(lit(1)), sum(length(col("text")))).head()
    val nDocs = stats.getLong(0)
    val bytes = stats.getLong(1)
    val nBench = math.max(1L, bench.count())
    val copies = math.max(5L,
      math.ceil(targetGB * 1e9 / (bytes.toDouble + nDocs * 16)).toLong / 5 * 5)

    // Contamination planting must stay BOUNDED PER BENCH DOC: the planted
    // rows append raw benchmark text (unsalted by necessity — the decontam
    // stage must hit their 7-grams exactly), so every planted row sharing
    // a bench doc band-collides with every other (mid-similarity pairs
    // flood 32x2 banding — the round-6 lesson). A fixed 1-in-211 rate
    // against a FIXED ~52-doc bench set went quadratic at 38 M rows
    // (~700-row cohorts per bench doc -> 31 M candidates, 2.4x the group
    // structure; the verify spill filled the volume). Cap at ~16 planted
    // rows per bench doc — realistic (eval contamination is rare in
    // absolute terms) and keeps candidates ∝ groups at every scale.
    //
    // Gate by HASH, decoupled from the copy/variant moduli. The round-12
    // revision gated on `variant === 3 && r % plantStep == 0` with a
    // data-dependent plantStep — arithmetically UNSATISFIABLE whenever
    // plantStep is a multiple of 5 (copies is a multiple of 5, so
    // variant-3 rows are exactly r ≡ 3 (mod 5), and every multiple of a
    // 5-divisible plantStep is ≡ 0 (mod 5)): the 14.4 GB run planted ZERO
    // rows and the decontam self-validation went silently vacuous. Even a
    // coprime plantStep planted at 1/5 the documented rate (only every
    // 5th multiple lands on variant 3). A hash gate over the variant-3
    // rows has no modulus to collide with: variant-3 rows number
    // nDocs·copies/5, so 1-in-plantEvery of them ≈ 16·nBench planted.
    val plantEvery = math.max(1L, nDocs * copies / (5L * 16L * nBench))
    val plantedGate = col("variant") === 3 &&
      pmod(xxhash64(lit("plant"), col("r")), lit(plantEvery)) === 0
    val rotated = docs.select(col("idx").as("rot_idx"),
      col("text").as("rot_text"))
    val benchTexts = bench
      .withColumn("bench_idx",
        row_number().over(Window.orderBy(col("doc_id"))).cast("long") - 1)
      .select(col("bench_idx"), col("text").as("bench_text"))
    def saltEvery3(text: Column, salt: Column): Column = array_join(
      transform(split(text, " "),
        (x, p) => when(p % 3 === 2, salt).otherwise(x)),
      " ")
    docs.crossJoin(spark.range(copies).toDF("copy"))
      // Distribute BEFORE the heavy text synthesis: `docs` is ONE
      // partition (the dense re-index window above is global), so without
      // this exchange the crossJoin product — and the two saltEvery3
      // string passes over every synthesized row — ran in a single task
      // (found by the 20 GB generation sitting at loadavg ~1; the salting
      // below is ~all of the generator's CPU). The old repartition at the
      // WRITE was below the projections and did not help.
      .repartition(cpus * 4)
      .withColumn("gid", floor(col("copy") / 5))
      .withColumn("variant", col("copy") % 5)
      .withColumn("r", col("idx") * copies + col("copy"))
      .withColumn("rot_idx", (col("idx") + col("gid")) % nDocs)
      // bench_idx by hash too: an arithmetic pmod(r, nBench) concentrates
      // planted rows on a subset of bench docs whenever the plant gate's
      // row spacing shares a factor with nBench (gcd alignment) —
      // recreating the quadratic cohort the per-doc cap bounds away
      .withColumn("bench_idx",
        pmod(xxhash64(lit("bench"), col("r")), lit(nBench)))
      .join(broadcast(rotated), "rot_idx")
      .join(broadcast(benchTexts), "bench_idx")
      .withColumn("base", saltEvery3(col("text"),
        concat(lit("g"), col("idx"), lit("x"), col("gid"))))
      // salt is UNIQUE PER ROW: an earlier mod-1000003 ring reused each
      // salt ~38x at a 38 M-doc corpus, and rows sharing a salt AND
      // overlapping real-token pairs produced spurious band collisions —
      // +0.7% verified pairs at 19 M docs (round 11), ~0.8 M extra
      // candidates at 38 M docs (measured 32.2 M ring vs 31.4 M unique;
      // the DOMINANT super-proportional term was the contamination
      // cohort, fixed separately above). Unique salts keep the dup
      // structure scale-invariant for the self-validation.
      .withColumn("unique_text", saltEvery3(col("rot_text"),
        concat(lit("s"), col("r"))))
      .select(
        col("r").as("doc_id"),
        col("source"),
        when(col("variant") <= 1, col("base"))
          .when(col("variant") === 2, concat(col("base"), lit(" zz")))
          // PLANTED benchmark contamination (a benchmark doc's text
          // appended) — what stage 5 must catch; rate bounded per bench
          // doc via the hash gate, see above
          .when(plantedGate,
            concat(col("unique_text"), lit(" "), col("bench_text")))
          .otherwise(col("unique_text")).as("text"))
      .write.mode(SaveMode.Overwrite).parquet(in.resolve("docs").toString)

    // Persist the planted ground truth so the run can self-validate the
    // decontamination stage against it (round-12 lesson: without this,
    // a vacuous decontam stage — zero planted rows — printed plausible
    // equal counts and nothing noticed). The planted predicate is pure
    // doc_id arithmetic (doc_id == r), so this is one column-pruned scan.
    spark.read.parquet(in.resolve("docs").toString)
      .select(col("doc_id"))
      .filter(col("doc_id") % 5 === 3 &&
        pmod(xxhash64(lit("plant"), col("doc_id")), lit(plantEvery)) === 0)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(in.resolve("planted").toString)

    Files.createDirectories(in)
    Files.write(in.resolve("_DONE"), Array.emptyByteArray)
  }
}
