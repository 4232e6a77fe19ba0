package graft.pipeline

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.operators.{Corpus, Sinks, Stats, Vocabulary}
import graft.sources.CorpusSources

/** Job configuration, INI-compatible with the reference's job.conf
  * (ConfigParser sections `vspace_conf` + `vspace_input`,
  * reference `base.py:306-328`).
  */
final case class VspaceConfig(
    stagingLoc: String,
    outputFolder: String,
    maxNgrams: Int,
    splits: Option[Int],
    corpus: String,
    index2doc: String,
    src2sub: String,
    collections: String,
    phrases: String,
    compatOffByOne: Boolean = false,
    /** "builtin" = lineSep text source (reference-shaped), "v2" = the
      * native vspace-corpus DSV2 connector with explicit byte-range
      * splits — the path for corpora whose files dwarf a default split.
      * Ids are contiguous under both; their file ordering differs on
      * multi-file corpora (see CorpusSources.loadRawCorpusV2). */
    corpusReader: String = "builtin",
    /** Key the gram stream by `xxhash64(gram)` instead of gram strings
      * through the counts materialization, vocabulary probe, and both
      * stats exchanges, restoring strings at the vocab-sized stats
      * output (Corpus.tokenCountHashesFromNormalized +
      * Stats.computeStatsHashed). Same five outputs, same rows.
      *
      * DEFAULT since round 14 (measured 85.02 vs 35.50 GB/h on the
      * 13.18 GB corpus — the 8-byte keys remove the gram-string bytes
      * from the counts materialization and every stats exchange, an
      * advantage that only grows with vocabulary size at corpus scale).
      * The string path remains selectable (`hashedstats = false`) as the
      * independent A/B witness: VspacePipelineSpec certifies both stats
      * tables bit-equal between the paths every build, vocabulary-side
      * hash collisions fail loudly (Stats.computeStatsHashed's
      * cardinality guard), and the residual gram-stream collision risk
      * (~n²/2⁶⁵) is certified per corpus by the same A/B when a corpus
      * warrants it. */
    hashedStats: Boolean = true)

object VspaceConfig {
  /** Minimal INI parser: `[section]` headers, `key = value` pairs, `#`/`;`
    * comments. No external deps. */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";"))
      .foreach { l =>
        if (l.startsWith("[") && l.endsWith("]")) {
          section = l.substring(1, l.length - 1).trim
          out.getOrElseUpdate(section, scala.collection.mutable.Map())
        } else l.split("=", 2) match {
          case Array(k, v) =>
            out.getOrElseUpdate(section, scala.collection.mutable.Map())
              .update(k.trim, v.trim)
          case _ => ()
        }
      }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  def load(path: String): VspaceConfig = {
    val ini  = parseIni(Files.readString(Paths.get(path)))
    val conf = ini.getOrElse("vspace_conf", Map.empty)
    val in   = ini.getOrElse("vspace_input", Map.empty)
    // fail fast on a typo'd reader name ("V2", "dsv2", …): historically the
    // two loaders could assign different doc ids on multi-file corpora, so a
    // silent fallback to builtin picked a different scan path undiagnosed
    val reader = conf.getOrElse("corpusreader", "builtin").toLowerCase
    require(Set("builtin", "v2").contains(reader),
      s"corpusreader must be 'builtin' or 'v2', got '$reader'")
    VspaceConfig(
      stagingLoc   = conf.getOrElse("stagingloc", "/tmp/vspace-staging"),
      outputFolder = conf.getOrElse("outputFolder",
        conf.getOrElse("outputfolder", "/tmp/vspace-out")),
      maxNgrams    = conf.getOrElse("maxngrams", "3").toInt,
      splits       = conf.get("splits").map(_.toInt),
      corpus       = in("corpus"),
      index2doc    = in("index2doc"),
      src2sub      = in("src2sub"),
      collections  = in("collections"),
      phrases      = in("phrases"),
      compatOffByOne = conf.get("compatoffbyone").exists(_.toBoolean),
      corpusReader   = reader,
      // absent => the hashed default (see the case-class scaladoc);
      // `hashedstats = false` selects the string path explicitly
      hashedStats    = conf.get("hashedstats").map(_.toBoolean).getOrElse(true))
  }
}

/** End-to-end vspace pipeline (reference `main()`, `base.py:306-441`):
  * vocabulary job -> corpus job -> stats job, with the same persist points
  * (vocabulary consumed twice, corpus consumed twice) and the same five
  * outputs. One Catalyst plan per output; the only driver materialization
  * is the optional BroadcastSetFilter path.
  */
object VspacePipeline {

  /** SPARK_GRAFT_VSPACE_LAPS=1: print a per-action wall-time lap to stderr
    * (vocabulary sink / normalized-corpus sink / n-gram+filter materialize
    * / per-source stats / global stats). Laps mode additionally forces the
    * `counts` cache through a count() action between the corpus and stats
    * jobs so "per-doc n-gram CPU" is separately timeable from "stats
    * joins+agg+sinks" — a measurement-only materialization production
    * rounds don't pay (the Dedup profile-mode convention: the split is the
    * signal, not the absolute sum). */
  private val Laps = sys.env.get("SPARK_GRAFT_VSPACE_LAPS").contains("1")

  /** SPARK_GRAFT_VSPACE_NOCACHE=1: do NOT persist the filtered n-gram
    * `counts` frame between its two stats consumers — each recomputes from
    * the cached normalized corpus instead. Measurement lever for the
    * round-12 stage-lap question: the counts frame is the exploded ≤6-gram
    * stream (~12 B rows at 13 GB input), and materializing it into the
    * block store costs serialization + spill I/O that recomputation from
    * `norm` (one cache read + the codegen'd gram kernel) may undercut now
    * that the per-doc CPU is fused. */
  private val NoCacheCounts = sys.env.get("SPARK_GRAFT_VSPACE_NOCACHE").contains("1")

  /** `onLap` receives (stage, seconds) after each output action — always,
    * not just under SPARK_GRAFT_VSPACE_LAPS (ThroughputBench persists the
    * laps into its artifact; round-13 lesson: stage tables that live only
    * in stderr get lost with the window). The laps-only extra
    * materialization between the corpus and stats jobs stays gated. */
  def run(spark: SparkSession, cfg: VspaceConfig,
      useBroadcastFilter: Boolean = false,
      onLap: (String, Double) => Unit = (_, _) => ()): Unit = {
    cfg.splits.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    val out = cfg.outputFolder
    // stage attribution in the Spark UI (reference sets a job group per
    // stage the same way, base.py:341,362,373,399)
    def stage(name: String): Unit =
      spark.sparkContext.setJobGroup(name, s"vspace $name", interruptOnCancel = false)
    var tLap = System.nanoTime()
    def lap(name: String): Unit = {
      val now = System.nanoTime()
      if (Laps)
        System.err.println(f"[vspace-lap] $name: ${(now - tLap) / 1e9}%.1f s")
      onLap(name, (now - tLap) / 1e9)
      tLap = now
    }

    // --- vocabulary job (reference base.py:341-371) ---
    stage("vocabulary")
    val vocabulary = Vocabulary.build(
      CorpusSources.loadPhrases(spark, cfg.phrases),
      CorpusSources.loadCollections(spark, cfg.collections))
      .persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeVocabulary(vocabulary, s"$out/vocabulary")
    lap("vocabulary")

    val tokenFilter =
      if (useBroadcastFilter) Vocabulary.BroadcastSetFilter(spark, vocabulary)
      else Vocabulary.SemiJoinFilter(vocabulary)

    // --- corpus job (reference base.py:373-397) ---
    stage("corpus")
    // guarded here as well as in VspaceConfig.load: a directly-constructed
    // config (ThroughputBench's env passthrough) must not silently fall
    // back to the builtin reader on a typo'd name
    require(Set("builtin", "v2").contains(cfg.corpusReader),
      s"corpusReader must be 'builtin' or 'v2', got '${cfg.corpusReader}'")
    val raw =
      if (cfg.corpusReader == "v2") CorpusSources.loadRawCorpusV2(spark, cfg.corpus)
      else CorpusSources.loadRawCorpus(spark, cfg.corpus)
    // Normalize ONCE and persist, like the reference's rdd1 (base.py:181,
    // persisted and feeding both the corpus write and the counts) — raw is
    // otherwise scanned + zipWithIndex'd + NFC-normalized twice. At cluster
    // scale the persist spills to local disk; that's still cheaper than a
    // second normalize pass over the full corpus.
    val norm = Corpus.normalized(raw).persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeNormalizedCorpus(norm, s"$out/normalized_corpus")
    lap("read+normalize+corpus_sink")
    val countsBase =
      if (cfg.hashedStats)
        Vocabulary.hashedSemiJoinFilter(
          Corpus.tokenCountHashesFromNormalized(norm, cfg.maxNgrams,
            cfg.compatOffByOne), vocabulary)
      else tokenFilter(
        Corpus.tokenCountsFromNormalized(norm, cfg.maxNgrams, cfg.compatOffByOne),
          "token")
    val counts =
      if (NoCacheCounts) countsBase
      else countsBase.persist(StorageLevel.MEMORY_AND_DISK)
    if (Laps && !NoCacheCounts) {
      counts.count(); lap("ngrams+vocab_filter (laps-only materialize)")
    }

    // --- stats job (reference base.py:399-439) ---
    stage("stats")
    val index   = CorpusSources.loadIndex(spark, cfg.index2doc)
    val sources = CorpusSources.loadSources(spark, cfg.src2sub)
    val withSources = Stats.combineCorpusWithSources(counts, index, sources)
    Sinks.writeStatsBySource(
      if (cfg.hashedStats)
        Stats.computeStatsHashed(withSources, vocabulary, Seq("source"))
      else Stats.computeStats(withSources, Seq("token", "source")),
      s"$out/stats_by_source")
    lap("per_source_stats")
    Sinks.writeStatsGlobal(
      if (cfg.hashedStats) Stats.computeStatsHashed(counts, vocabulary, Seq.empty)
      else Stats.computeStats(counts, Seq("token")),
      s"$out/stats_global")
    lap("global_stats")

    if (!NoCacheCounts) counts.unpersist()
    norm.unpersist()
    vocabulary.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val cfg = VspaceConfig.load(args(0))
    val spark = SparkSession.builder()
      .appName("graft-vspace")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString))
      .getOrCreate()
    try run(spark, cfg) finally spark.stop()
  }
}
