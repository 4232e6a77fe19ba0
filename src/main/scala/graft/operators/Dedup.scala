package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: after near-dup PAIR detection (MinHash/
  * SimHash/cosine), production dedup needs the transitive closure — one
  * canonical representative per connected component of the pair graph.
  *
  * Implemented as iterative min-label propagation: each node starts
  * labeled with its own id; every round each node takes the min of its
  * label and its neighbors' labels; converges in O(component diameter)
  * rounds. Each round is one shuffle on the node id — the standard
  * large-scale shape (what GraphFrames/Pregel do under the hood), safe at
  * any graph size because nothing is ever collected to the driver; the
  * driver only checks the "any label changed?" bit per round.
  *
  * Iteration hygiene (the part naive loops get wrong at scale): the edge
  * set is persisted once up front — its lineage is often an expensive
  * candidate-generation pipeline (MinHash→LSH→verification) that must not
  * re-run per round — and the label frontier is localCheckpoint'ed every
  * few rounds so the plan doesn't accrete one join per iteration (growing
  * lineage blows up planning time and, on executor loss, recompute cost).
  */
object Dedup {

  /** How often to truncate the label lineage. Env-overridable
    * (SPARK_GRAFT_CC_CKPT_EVERY) as a measurement lever: the r9-r11 probe
    * question was how much of a CC round is label joins vs checkpoint
    * write, and cadence is the knob that trades lineage growth against
    * write round-trips. Default 3 (measured best on the q36 graph). */
  private val CheckpointEvery =
    sys.env.get("SPARK_GRAFT_CC_CKPT_EVERY").flatMap { s =>
      // validated: it is used as a modulus deep inside a long CC run, where
      // a 0 (ArithmeticException) or junk (NumberFormatException at
      // class-init) would abort hours in — fall back loudly instead
      val parsed = scala.util.Try(s.trim.toInt).toOption.filter(_ >= 1)
      if (parsed.isEmpty)
        System.err.println(
          s"[graft] ignoring invalid SPARK_GRAFT_CC_CKPT_EVERY='$s' (need integer >= 1); using default 3")
      parsed
    }.getOrElse(3)

  /** SPARK_GRAFT_CC_PROFILE=1: log a per-round wall-time split to stderr —
    * join/materialize wall vs checkpoint-write wall vs convergence-check
    * wall. Profile mode materializes the joined frame (persist+count)
    * BEFORE the checkpoint write so the two are separately timeable; that
    * extra materialization makes profiled rounds slightly slower than
    * production rounds, so the split is the signal, not the absolute sum. */
  private val Profile = sys.env.get("SPARK_GRAFT_CC_PROFILE").contains("1")

  /** edges: undirected pairs in columns (a, b). Returns (id, cluster_id)
    * for every node that appears in an edge, cluster_id = min node id of
    * its component. Warns on stderr if maxIter is hit before convergence
    * (returned labels are then an upper bound, not final clusters).
    *
    * `pathDoubling` adds a pointer-jump step per round (follow the
    * propagated label one more hop through the label table itself), which
    * makes the reach of a round double — O(log diameter) rounds instead of
    * O(diameter). Off by default: near-dup cluster graphs are dense and
    * low-diameter, so the extra node-sized join per round costs more than
    * the rounds it saves; turn it on for chain-like graphs (e.g. edges
    * from sliding-window or as-of relations) where diameter is unbounded.
    *
    * CONCURRENCY: when `numPartitions` is set, this method temporarily
    * overrides the SESSION's `spark.sql.shuffle.partitions` for the
    * duration of the iteration (restored in `finally`; rationale in the
    * body — cached-plan exchanges ignore a per-plan repartition). Do NOT
    * run other actions on the same SparkSession concurrently with such a
    * call: they would plan their shuffles at the edge-sized count. All of
    * this library's own callers run it synchronously. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
      pathDoubling: Boolean = false, numPartitions: Option[Int] = None): DataFrame = {
    // Pre-partition the symmetric edge set on the join key BEFORE caching:
    // every iteration joins sym on `b`, and a cached frame keeps its
    // physical partitioning, so the per-round plan reuses this one shuffle
    // instead of re-exchanging the (potentially huge) edge set every round.
    //
    // `numPartitions` sizes that ONE partitioning — and with it every
    // per-round stage, because the iterative joins co-partition to the
    // cached sym (a USER repartition, exempt from AQE coalescing). Pass it
    // when the session's shuffle partitions are sized for a much larger
    // frame: inside the data pipeline the session runs ~128
    // partitions/GB-of-corpus for the text shuffles, but the edge frame is
    // 1000x smaller than the corpus, so inheriting the session count made
    // every CC round pay ~1800 near-empty tasks x several stages x 2
    // count actions — measured as the stage's 4.5x-time-at-2x-data
    // super-linearity at the 14.4 GB scale point (the per-round work is
    // label-sized; the task/shuffle-file OVERHEAD was the scaling term,
    // doubling with corpus-tracked partitions on top of doubled rounds'
    // data). Default (None) keeps the session conf — correct wherever the
    // session is sized for frames like the edges themselves.
    val parts = numPartitions.getOrElse(
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    // Scoping the conf (not just sym's repartition) matters: every
    // per-round frame is persisted, and AQE does not re-plan cached-plan
    // exchanges (canChangeCachedPlanOutputPartitioning defaults false), so
    // the per-round groupBy/join exchanges would otherwise still run at
    // the session count. All actions against these plans happen inside
    // this function (counts in the loop + the final localCheckpoint), so
    // restoring the conf afterwards is safe.
    val sessConf = edges.sparkSession.conf
    val prevParts = sessConf.get("spark.sql.shuffle.partitions")
    if (numPartitions.isDefined)
      sessConf.set("spark.sql.shuffle.partitions", parts)
    try connectedComponentsImpl(edges, maxIter, pathDoubling, parts)
    finally if (numPartitions.isDefined)
      sessConf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def connectedComponentsImpl(edges: DataFrame, maxIter: Int,
      pathDoubling: Boolean, parts: Int): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(parts, col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `cached` is the frame actually holding materialized data (persisted or
    // checkpointed); `labels` is the (id, lbl) view over it. Tracked
    // separately so unpersist() targets the exact cached plan.
    var cached = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels  = cached
    var iter    = 0
    var changed = true
    while (changed && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("lbl").as("blbl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("blbl")).as("nbl"))
      // Carry the "did this node improve?" bit through the update itself so
      // the convergence check is a count on the materialized frame, not a
      // second labels join per round.
      val prop = labels
        .join(nbrMin.select(col("a").as("id"), col("nbl")), Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("plbl"))
      val joined =
        if (!pathDoubling)
          prop.select(col("id"), col("plbl").as("lbl"),
            (col("plbl") < col("lbl")).as("improved"))
        else {
          // A label is always the id of a node in the same component, so
          // label[label[v]] is too — following one extra hop through the
          // propagated table keeps every invariant and doubles the reach.
          prop
            .join(prop.select(col("id").as("plbl"), col("plbl").as("qlbl"))
              .withColumnRenamed("plbl", "__p"),
              col("plbl") === col("__p"), "left")
            .select(col("id"),
              least(col("plbl"), coalesce(col("qlbl"), col("plbl"))).as("lbl"),
              (least(col("plbl"), coalesce(col("qlbl"), col("plbl")))
                < col("lbl")).as("improved"))
        }
      val ckptRound = iter % CheckpointEvery == CheckpointEvery - 1
      val next =
        if (!Profile) {
          if (ckptRound) joined.localCheckpoint(eager = true)
          else joined.persist(StorageLevel.MEMORY_AND_DISK)
        } else {
          // profile mode: force the join work through a persist+count so
          // the checkpoint write (which otherwise executes the join inside
          // itself) is timed on already-materialized input
          val t0 = System.nanoTime()
          val mat = joined.persist(StorageLevel.MEMORY_AND_DISK)
          mat.count()
          val tJoin = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val out = if (ckptRound) {
            val c = mat.localCheckpoint(eager = true)
            mat.unpersist()
            c
          } else mat
          val tCkpt = (System.nanoTime() - t1) / 1e9
          System.err.println(
            f"[graft] cc round $iter: join=$tJoin%.2f s " +
              f"ckpt=${if (ckptRound) f"$tCkpt%.2f" else "-"} s")
          out
        }
      val tChk = System.nanoTime()
      changed = next.filter(col("improved")).limit(1).count() > 0
      if (Profile)
        System.err.println(f"[graft] cc round $iter: converge_check=" +
          f"${(System.nanoTime() - tChk) / 1e9}%.2f s")
      cached.unpersist()
      cached = next
      labels = next.drop("improved")
      iter += 1
    }
    if (changed)
      System.err.println(
        s"[graft] Dedup.connectedComponents: NOT converged after $maxIter " +
          "iterations — labels are not final; raise maxIter (graph diameter " +
          "exceeds it)")
    // Truncate lineage before releasing the edge cache so the returned frame
    // never re-derives the (possibly very expensive) pair pipeline.
    val out = labels.localCheckpoint(eager = true)
      .withColumnRenamed("lbl", "cluster_id")
    cached.unpersist()
    sym.unpersist()
    out
  }
}
