package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{rolling_hash, word_ngrams}

/** Interpreted-HOF lap bench — the round-11 method, industrialized. Round
  * 11 proved that higher-order functions (`transform`/`aggregate`/`filter`)
  * never enter WholeStageCodegen and that fusing the LSH family's HOF
  * chains into codegen'd kernels was worth 2.9x END-TO-END — and also that
  * the sf0.1 gate is blind to all of it (per-row CPU is negligible at 5 k
  * docs). This tool laps every remaining corpus-scale HOF consumer in the
  * catalog at PIPELINE scale (the multi-GB synthesized corpus from
  * [[DataPipelineBench]]), composed form vs fused kernel where one exists,
  * so "hot enough to fuse" is a measured verdict instead of a guess.
  *
  * Candidates (the round-11 verdict's list):
  *   - q57b's nested higher-order mode (top-bigram share: array_max over
  *     transform(distinct, x => size(filter(bg, y => y = x))) —
  *     O(distinct x len) INTERPRETED per doc)
  *   - q53's winnowing window fold (transform(sequence, i =>
  *     array_min(slice(hashes, i, 4))) — a slice allocation per position)
  *   - q199's per-frame RMS chain (aggregate(transform(sequence(1,
  *     length(fb)), i -> ascii(substr)), ...) — ~4 interpreted expression
  *     nodes PER BYTE)
  *   - q121's broadcast best-(sim, id) aggregate fold (struct state per
  *     bench element; the invariant query-vector norm is recomputed inside
  *     the lambda per element)
  *   - q91's shared-span position scan (transform-with-index +
  *     array_contains over the pair's window arrays — O(|wa| x |wb|)
  *     string comparisons per candidate pair)
  *
  * Protocol: per variant — untimed warmup is SKIPPED (each variant is a
  * single scan of a GB-scale corpus; JIT noise is <2% at these durations),
  * dual host canaries before each timed rep, min of 2 reps, noop sink.
  * Results printed as JSON lines and persisted via [[graft.BenchOut]]
  * (`target/hoflap-last.json[l]`).
  *
  * Usage: runMain graft.tools.HofLap [corpusDir] [variantCsv]
  *   corpusDir default target/dpbench/in_2p00/docs (run DataPipelineBench
  *   once to create it).
  */
object HofLap {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // dot-decimal JSON under any host locale
    val corpusDir = if (args.length > 0) args(0) else "target/dpbench/in_2p00/docs"
    val only = if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("graft-hof-lap")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(corpusDir)
    val gb = docs.agg(sum(length(col("text")))).head().getLong(0) / 1e9
    System.err.println(f"[hoflap] corpus $corpusDir: $gb%.2f GB text")

    graft.HostCanary.sec(); graft.HostCanary.parSec() // JIT-warm

    val variants = candidates(spark, docs).filter {
      case (name, _) => only.forall(_.exists(name.startsWith))
    }
    val rows = variants.map { case (name, mk) =>
      spark.catalog.clearCache()
      System.gc()
      val c  = graft.HostCanary.sec()
      val pc = graft.HostCanary.parSec()
      def rep(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try math.min(rep(), rep())
        catch { case e: Throwable =>
          System.err.println(s"[hoflap] $name FAILED: $e"); -1.0 }
      val line = f"""{"metric":"hoflap","name":"$name","value":$t%.2f,"unit":"sec","gb":$gb%.2f,"canary":$c%.3f,"par_canary":$pc%.3f,"loadavg":${graft.HostCanary.loadAvg()}%.1f}"""
      println(line)
      System.out.flush()
      graft.BenchOut.appendLine("hoflap-last", line)
      (name, t)
    }
    val summary = rows.map { case (n, t) => f""""$n":$t%.2f""" }
      .mkString(s"""{"metric":"hoflap","gb":${f"$gb%.2f"},"secs":{""", ",", "}}")
    println(summary)
    System.out.flush()
    graft.BenchOut.writeSummary("hoflap-last", summary)
    spark.stop()
  }

  /** Each candidate: (name, () => DataFrame). Composed forms are the exact
    * expression shapes of the cited catalog queries, applied UNCAPPED to
    * the pipeline corpus (the gated queries cap or sort only for the
    * oracle's benefit; the per-doc math is what scales). */
  private def candidates(spark: SparkSession, docs: DataFrame)
      : Seq[(String, () => DataFrame)] = {
    val toks = split(col("text"), " ")

    // --- q57b: Gopher repetition incl. the nested top-bigram mode ---
    def dupFrac(g: Column): Column = round(lit(1.0) -
      size(array_distinct(g)).cast("double") / greatest(size(g), lit(1)), 4)
    val q57bComposed = () => docs
      .select(col("doc_id"), word_ngrams(toks, 2).as("bg"),
        word_ngrams(toks, 5).as("g5"), word_ngrams(toks, 10).as("g10"))
      .select(col("doc_id"),
        dupFrac(col("g5")).as("dup_5gram_frac"),
        dupFrac(col("g10")).as("dup_10gram_frac"),
        round(coalesce(
          array_max(transform(array_distinct(col("bg")), x =>
            size(filter(col("bg"), y => y === x)))).cast("double")
            / greatest(size(col("bg")), lit(1)), lit(0.0)), 4)
          .as("top_bigram_share"))

    // --- q53: winnowing fingerprints ---
    val q53Composed = () => docs
      .select(col("doc_id"),
        transform(word_ngrams(toks, 3), g => rolling_hash(g)).as("hashes"))
      .select(col("doc_id"),
        transform(
          sequence(lit(1), greatest(size(col("hashes")) - 3, lit(1))),
          i => array_min(slice(col("hashes"), i, lit(4)))).as("wins"))
      .select(col("doc_id"),
        size(array_distinct(col("wins"))).as("n_fingerprints"),
        array_min(col("wins")).as("min_fp"))

    // --- q199: frame RMS, uncapped over a 1/8 corpus slice (the per-byte
    //     interpreted chain is slow enough that a full-corpus composed lap
    //     would dominate the tool's wall clock; both variants use the SAME
    //     slice so the ratio is exact and the GB/h extrapolates) ---
    val slice199 = docs.filter(pmod(col("doc_id"), lit(8)) === 0)
    val q199Composed = () => slice199
      .select(col("doc_id").as("media_id"),
        explode(sequence(lit(0L),
          ceil(length(col("text")) / 64.0).cast("long") - 1)).as("frame_idx"),
        col("text"))
      .select(col("media_id"), col("frame_idx"),
        expr("substr(text, cast(frame_idx * 64 + 1 as int), 64)").as("fb"))
      .filter(length(col("fb")) > 0)
      .select(col("media_id"), col("frame_idx"),
        round(sqrt(
          expr("""aggregate(transform(sequence(1, length(fb)),
                 |  i -> cast(ascii(substr(fb, i, 1)) as double)),
                 |  0D, (a, x) -> a + x * x)""".stripMargin)
            / length(col("fb"))), 4).as("rms"))

    // --- q121: broadcast best-(sim, id) fold. Vectors synthesized at
    //     corpus-ish scale (500k train x 100 bench = 50M cosines) ---
    val nVecs = 500000L
    val nBench = 100L
    def synthVecs(n: Long, seed: Int): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (pmod(xxhash64(col("id"), d, lit(seed)), lit(2001L)) - lit(1000L))
            / lit(1000.0)).as("v"))
    val q121Composed = () => {
      val bench = synthVecs(nBench, 7)
        .agg(sort_array(collect_list(
          struct(col("vec_id").as("id"), col("v").as("bv")))).as("bench"))
      synthVecs(nVecs, 13)
        .crossJoin(broadcast(bench))
        .select(col("vec_id"),
          aggregate(col("bench"),
            struct(lit(-2.0).as("sim"), lit(-1L).as("id")),
            (acc, b) => {
              val sim = round(
                graft.functions.cosine_sim(col("v"), b.getField("bv")), 4)
              when(sim > acc.getField("sim"),
                struct(sim.as("sim"), b.getField("id").as("id")))
                .otherwise(acc)
            }).as("best"))
        .select(col("vec_id"), col("best.sim").as("max_sim"),
          col("best.id").as("near_id"))
    }

    // --- q91: shared-span merge over a doc_id-prefix slice (keeps the
    //     generator's 5-copy dup groups intact, so candidate pairs are
    //     real near-verbatim pairs with heavy span work). The prefix is
    //     sized so the composed O(|wa| x |wb|) position scan finishes in
    //     lap time; both variants share the slice. ---
    val maxQ91Id = 400000L
    val slice91 = docs.filter(col("doc_id") < maxQ91Id)
    val q91Composed = () =>
      graft.queries.DedupQueries.sharedSpans(slice91, w = 30)

    // --- fused twins (the FoldKernels expressions; bit-equality spec'd in
    //     FoldKernelsSpec — here they are TIMED against the composed forms
    //     on the same data). First-lap lesson baked in: fusing only the
    //     TERMINAL fold (top_count over a composed word_ngrams array)
    //     measured NEUTRAL (272 -> 264 s at 2.27 GB) because the
    //     interpreted gram-ARRAY construction was the cost — so the fused
    //     variants below are fully gram-free. ---
    val q57bFused = () => {
      import graft.functions.{word_ngram_count, word_ngram_top_count, word_ngrams_distinct}
      def dupFracF(n: Int) = round(lit(1.0) -
        size(word_ngrams_distinct(toks, n)).cast("double")
          / greatest(word_ngram_count(toks, n), lit(1)), 4)
      docs.select(col("doc_id"),
        dupFracF(5).as("dup_5gram_frac"),
        dupFracF(10).as("dup_10gram_frac"),
        round(coalesce(
          word_ngram_top_count(toks, 2).cast("double")
            / greatest(word_ngram_count(toks, 2), lit(1)), lit(0.0)), 4)
          .as("top_bigram_share"))
    }

    val q53Fused = () => docs
      .select(col("doc_id"),
        graft.functions.word_ngram_rolling_hashes(toks, 3).as("hashes"))
      .select(col("doc_id"),
        graft.functions.window_mins(col("hashes"), 4).as("wins"))
      .select(col("doc_id"),
        size(array_distinct(col("wins"))).as("n_fingerprints"),
        array_min(col("wins")).as("min_fp"))

    val q199Fused = () => slice199
      .select(col("doc_id").as("media_id"),
        explode(sequence(lit(0L),
          ceil(length(col("text")) / 64.0).cast("long") - 1)).as("frame_idx"),
        col("text"))
      .select(col("media_id"), col("frame_idx"),
        expr("substr(text, cast(frame_idx * 64 + 1 as int), 64)").as("fb"))
      .filter(length(col("fb")) > 0)
      .select(col("media_id"), col("frame_idx"),
        round(sqrt(graft.functions.codepoint_energy(col("fb"))
          / length(col("fb"))), 4).as("rms"))

    val q121Fused = () => {
      val bench = synthVecs(nBench, 7)
        .agg(sort_array(collect_list(
          struct(col("vec_id").as("id"), col("v").as("bv")))).as("bench"))
      synthVecs(nVecs, 13)
        .crossJoin(broadcast(bench))
        .select(col("vec_id"),
          graft.functions.best_cosine(col("v"), col("bench")).as("best"))
        .select(col("vec_id"), col("best.sim").as("max_sim"),
          col("best.id").as("near_id"))
    }

    val q91Fused = () =>
      graft.queries.DedupQueries.sharedSpansFused(slice91, w = 30)

    Seq(
      "q57b_composed" -> q57bComposed,
      "q57b_fused" -> q57bFused,
      "q53_composed" -> q53Composed,
      "q53_fused" -> q53Fused,
      "q199_composed" -> q199Composed,
      "q199_fused" -> q199Fused,
      "q121_composed" -> q121Composed,
      "q121_fused" -> q121Fused,
      "q91_composed" -> q91Composed,
      "q91_fused" -> q91Fused)
  }
}
