package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TextRank (Mihalcea & Tarau 2004): PageRank over the token co-occurrence
  * graph, the classic unsupervised keyword/keyphrase scorer — the graph
  * twin of the frequency-based quality signals the engine already ships
  * (DF/TF stats, Zipf profile, repetition rules). A corpus-level keyword
  * ranking is what a training-data pipeline uses to build domain lexicons
  * and topic filters without labels.
  *
  * Graph: nodes = vocabulary, undirected edges = adjacent-token
  * co-occurrence weighted by pair count (window = 2; wider windows just
  * add shifted slices). Rank update is weighted PageRank,
  *   r'(v) = (1-d) + d * sum over in-neighbors u of r(u) * w(u,v)/wdeg(u),
  * iterated a FIXED number of rounds for deterministic output.
  *
  * Scale shape (the same discipline as [[Dedup.clusters]]): the edge set —
  * corpus-derived, potentially huge — is aggregated ONCE, pre-partitioned
  * on src, and persisted; each round shuffles only the vocabulary-sized
  * rank frame (ranks join edges on src → contributions aggregate on dst),
  * with map-side partial aggregation collapsing the per-edge contributions
  * before the dst exchange. Rank lineage is localCheckpoint'ed every few
  * rounds so the plan stays round-sized instead of accreting one
  * join+agg per iteration. Nothing is collected to the driver.
  */
object TextRank {

  private val CheckpointEvery = 4

  /** Ranks from an edge list (src, dst, w) — must already contain BOTH
    * directions of each undirected co-occurrence. Returns (token, rank). */
  def ranks(edges: DataFrame, damping: Double = 0.85, iters: Int = 15): DataFrame = {
    val spark = edges.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // one-time edge materialization: partitioned by the join key so every
    // iteration's ranks-join probes a stable, already-shuffled build side
    val e = edges.repartition(n, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree weight sums, folded into the edge frame so the per-round
    // join is single: (src, dst, w/wdeg) is the contribution fraction
    val frac = e
      .join(e.groupBy(col("src")).agg(sum(col("w")).as("wdeg")), "src")
      .select(col("src"), col("dst"), (col("w") / col("wdeg")).as("f"))
      .repartition(n, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    frac.count()
    e.unpersist()

    val nodes = frac.select(col("src").as("token")).distinct()
    var ranks = nodes.select(col("token"), lit(1.0).as("rank"))
      .repartition(n, col("token")).persist(StorageLevel.MEMORY_AND_DISK)

    for (i <- 1 to iters) {
      val contrib = frac
        .join(ranks.withColumnRenamed("token", "src"), "src")
        .groupBy(col("dst").as("token"))
        .agg(sum(col("rank") * col("f")).as("c"))
      var next = nodes
        .join(contrib, Seq("token"), "left")
        .select(col("token"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0)))
            .as("rank"))
        .repartition(n, col("token"))
      // checkpoint on the cadence AND on the final round, so the returned
      // frame is LogicalRDD-rooted: without the final truncation the
      // caller's plan drags the whole nested persist lineage (a 900+
      // node plan string that dwarfs the actual physical work)
      if (i % CheckpointEvery == 0 || i == iters) next = next.localCheckpoint()
      next = next.persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist()
      ranks = next
    }
    ranks
  }

  /** Adjacent-pair (window=2) undirected co-occurrence edges from a
    * (doc_id, text) frame: two shifted in-row slices zipped — a Generate,
    * no shuffle — then one (src, dst) aggregation. */
  def cooccurrenceEdges(docs: DataFrame): DataFrame = {
    val t = docs.select(split(col("text"), " ").as("toks"))
    val pairs = t
      .select(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("xs"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("ys"))
      .select(explode(arrays_zip(col("xs"), col("ys"))).as("p"))
      .select(col("p.xs").as("x"), col("p.ys").as("y"))
      // self-loops contribute rank to their own source; drop them (standard)
      .filter(col("x") =!= col("y"))
    pairs.select(col("x").as("src"), col("y").as("dst"))
      .union(pairs.select(col("y").as("src"), col("x").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }
}
