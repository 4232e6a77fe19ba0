package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{cosine_sim, xxhash64_seeded}

/** Similarity search over the `embeddings` table (`Array[Float]` columns):
  * brute-force cosine top-k as the correctness baseline, a random-hyperplane
  * LSH-bucketed variant as the scale path, recall of ANN vs exact, and
  * per-label centroids.
  *
  * Scale posture (100 TB): brute-force is a broadcast nested-loop of a tiny
  * query set against the full corpus — embarrassingly parallel, no shuffle
  * of the big side; every top-k per query goes through the bounded-heap
  * `top_k` aggregate (map-side partial reduction to k rows per partition —
  * no skewed per-query window sort). The LSH variant buckets the corpus by
  * a 16-bit hyperplane signature so each query only scores its bucket; at
  * cluster scale the buckets are the unit of partition pruning (write the
  * index `partitionBy(bucket)`).
  */
object SimilarityQueries {

  // 4 planes -> 16 buckets: sized so buckets stay populated at harness SFs
  // (500-5000 vectors); at cluster scale raise toward log2(n/target_bucket).
  private val NumPlanes = 4

  private def vecs(s: SparkSession, dir: String): DataFrame =
    fanout(Tables(s, dir, "embeddings"))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  /** Unit-normalized vectors: on the unit sphere L2 order == cosine order,
    * so the L2-trained quantizers (KMeans coarse cells, PQ codebooks) rank
    * the same neighborhoods the cosine baseline does. All index paths
    * (IVF, PQ, IVF-PQ) build over this view, as does the SemDeDup pass
    * (DedupQueries q90). */
  private[queries] def unitVecs(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).select(col("vec_id"), col("label"),
      transform(col("v"), x => x / graft.functions.vec_norm(col("v"))).as("v"))

  /** Deterministic pseudo-random hyperplanes: component d of plane p is
    * +-1 from the sign bit of xxhash64(seed, d). The dot-product sign
    * bits concatenate into the bucket signature. `table` selects an
    * independent plane-set (disjoint seed range) so callers can run
    * multi-table LSH — candidates unioned across tables, the standard
    * recall lever (used by the bucketed embedding-cosine dedup path,
    * DedupQueries q38/q39). */
  private[queries] def lshSignature(v: Column, table: Int = 0): Column = {
    val planeDots: Seq[Column] = (0 until NumPlanes).map { p =>
      val seed = (table * NumPlanes + p).toLong
      // The plane is a constant — but Catalyst never constant-folds inside
      // higher-order-function lambdas, so writing it as
      // transform(sequence(0,63), d -> xxhash64(seed, d)...) re-hashes 64
      // ints PER ROW (x planes x tables). Evaluate the identical hash once
      // here and ship the +-1 components as a literal array.
      val signs: Seq[Double] = (0 until 64).map { d =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(org.apache.spark.sql.catalyst.expressions.Literal(d)), seed)
          .eval(null).asInstanceOf[Long]
        if (h >= 0) 1.0 else -1.0
      }
      val signedSum = graft.functions.vec_dot(v, typedLit(signs))
      when(signedSum > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planeDots.reduce(_ + _)
  }

  /** (query_id, vec_id, sim, rank): top-k per query by (sim desc, vec_id
    * asc) via the bounded-heap [[graft.functions.top_k]] aggregate —
    * O(n log k) heaps map-side, k rows per (map partition, query) through
    * the shuffle, and no sort of the candidate set anywhere. The window
    * formulation it replaces needs a full sort of every map partition to
    * feed its group-limit plus a per-key sort after the shuffle (see
    * top_k's scaladoc for the honest InferWindowGroupLimit comparison).
    * Negating `sim` turns the mixed-direction ordering into the struct's
    * natural ascending order (exact for all non-NaN doubles). */
  private def rankBySimDesc(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.top_k(
        struct((-col("sim")).as("ns"), col("vec_id").as("vec_id")), k,
        smallest = true).as("t"))
      .select(col("query_id"), posexplode(col("t")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.vec_id").as("vec_id"),
        (-col("e.ns")).as("sim"), (col("r0") + 1).cast("int").as("rank"))

  /** The ADC twin: top-k per query by (adc asc, vec_id asc), adc dropped
    * from the output like the window version it replaces. */
  private def rankByAdcAsc(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.top_k(
        struct(col("adc").as("adc"), col("vec_id").as("vec_id")), k,
        smallest = true).as("t"))
      .select(col("query_id"), posexplode(col("t")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.vec_id").as("vec_id"),
        (col("r0") + 1).cast("int").as("rank"))

  private[graft] def knn(s: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val all = vecs(s, dir)
    val q   = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    rankBySimDesc(
      all.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
      k)
  }

  private val PqM = 16
  private val PqK = 16

  /** Collected (query_id, unit vector) pairs — the tiny side by contract. */
  private def collectQueries(all: DataFrame, nQueries: Int): Array[(Long, Array[Double])] =
    all.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

  /** PQ ANN: one codebook training pass, one map-side encode, then each
    * query ranks the whole corpus by ADC lookups over the codes column —
    * exact kNN's scan shape but over 16-byte codes instead of 512-byte
    * vectors. The per-query m×k distance tables are computed driver-side
    * ([[graft.operators.PQ.adcTable]]) and shipped as an `array<double>`
    * COLUMN of a broadcast query frame scored by
    * [[graft.operators.PQ.adcLookup]] — ONE plan branch regardless of
    * query count (the literal-per-query `adcDistance` path grows the plan
    * linearly; it remains the single-query convenience, pinned by PQSpec). */
  private def pqTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int): DataFrame = {
    import s.implicits._
    val all = unitVecs(s, dir)
    val model = memoFit(s, dir, "pq-raw")(
      graft.operators.PQ.fit(all, "v", "vec_id", m = PqM, k = PqK, iters = 3))
    val coded = all.select(col("vec_id"),
      graft.operators.PQ.encode(col("v"), model).as("codes"))
    val tables = collectQueries(all, nQueries).toSeq
      .map { case (qid, qv) =>
        (qid, graft.operators.PQ.adcTable(model, qv).toSeq) }
      .toDF("query_id", "adc_table")
    rankByAdcAsc(
      coded.crossJoin(broadcast(tables))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          graft.operators.PQ.adcLookup(col("codes"), col("adc_table"), model)
            .as("adc")),
      k)
  }

  /** Multi-table LSH ANN: each vector keyed by (table, bucket) for
    * `NumTables` independent plane-sets (one map-side explode), each query
    * scores the UNION of its buckets across tables — the recall lever that
    * single-table bucketing lacks. Candidates deduped before scoring, so
    * cost stays linear in distinct candidates per query. */
  private val NumTables = 8

  private def annLshTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int): DataFrame = {
    val keyed = vecs(s, dir).select(col("vec_id"), col("v"),
        explode(array((0 until NumTables).map(t =>
          struct(lit(t).as("t"), lshSignature(col("v"), t).as("bk"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.t").as("t"), col("tb.bk").as("bk"))
    val q = keyed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("t"), col("bk"))
    rankBySimDesc(
      keyed.join(broadcast(q), Seq("t", "bk"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
        .dropDuplicates("query_id", "vec_id")
        .select(col("query_id"), col("vec_id"),
          round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
      k)
  }

  val queries: Seq[Q] = Seq(

    // --- exact kNN JOIN: top-3 cosine neighbors for EVERY vector — the
    //     symmetric all-vectors shape where, unlike q40's handful of
    //     broadcast queries, NEITHER side fits an executor. The plan is the
    //     canonical block-partitioned exact join: repartition both sides
    //     into B blocks and crossJoin — Spark's cartesian pairs PARTITIONS,
    //     so each of the B^2 tasks streams one right block against one left
    //     block (memory bounded by two blocks, sized via B at any corpus
    //     scale). The global per-query top-k is the bounded-heap CollectTopK
    //     aggregate, whose map-side PARTIAL step reduces each task to k rows
    //     per query seen — so k*B rows per query cross the shuffle, never
    //     the N^2 scored pairs. Used as the ground-truth builder the ANN
    //     recall family (q43/q45/q48/q49b) compares against when the query
    //     set is the whole corpus (kNN graphs, SemDeDup, hard-negative
    //     mining). ---
    Q("q124_knn_join",
      (s, dir) => {
        val all = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val blocks = s.sparkContext.defaultParallelism.min(8)
        rankBySimDesc(
          all.toDF("query_id", "qv").repartition(blocks)
            .crossJoin(all.toDF("vec_id", "v").repartition(blocks))
            .filter(col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id"),
              round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
          k = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |           FROM embeddings),
             |scored AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
             |  FROM e q JOIN e c ON q.vec_id <> c.vec_id),
             |ranked AS (
             |  SELECT query_id, vec_id, sim,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY sim DESC, vec_id) AS rank
             |  FROM scored)
             |SELECT query_id, vec_id, sim, rank FROM ranked
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // --- brute-force cosine top-10 for 5 query vectors ---
    Q("q40_knn_bruteforce",
      (s, dir) => knn(s, dir, nQueries = 5, k = 10)
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             |scored AS (
             |  SELECT query_id, vec_id,
             |         round(list_cosine_similarity(qv, v), 4) AS sim
             |  FROM e CROSS JOIN q WHERE vec_id <> query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, sim,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY sim DESC, vec_id) AS rank
             |  FROM scored)
             |SELECT query_id, vec_id, sim, rank FROM ranked
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),
      bench = true),

    // --- per-label centroid (elementwise mean), reported as squared norm
    //     (position-wise avg matches the DuckDB v[i] formulation) ---
    Q("q41_label_centroids",
      (s, dir) => {
        vecs(s, dir)
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("c"))
          .groupBy(col("label"))
          .agg(round(sum(col("c") * col("c")), 4).as("sqnorm"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
             |x AS (SELECT label, i, avg(v[i]) AS c
             |      FROM e, range(1, 65) r(i) GROUP BY 1,2)
             |SELECT label, round(sum(c*c),4) AS sqnorm
             |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- ANN via multi-table random-hyperplane LSH: each query scores the
    //     union of its 8 table-buckets (candidates deduped before scoring).
    //     Engine-internal hash family -> rows-only gate; quality is
    //     measured against exact kNN by q43. ---
    Q("q42_ann_lsh",
      (s, dir) => annLshTopK(s, dir, nQueries = 5, k = 10)
        .orderBy(col("query_id"), col("rank")),
      None),

    // --- recall@10 of the LSH path vs brute force (self-contained quality
    //     metric; both sides computed in-engine) ---
    Q("q43_ann_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = annLshTopK(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- IVF ANN with the TRAINED coarse quantizer (operators.KMeans over
    //     the unit-normalized corpus): every vector is assigned to its
    //     nearest cell entirely map-side (struct-argmin against the k x d
    //     centroid literals — no join, no window), and each query scores
    //     only its nprobe=3 closest cells. At cluster scale the index is
    //     written partitionBy(cell) so probes become partition-pruned
    //     scans (IvfIndexSpec demonstrates the pruning). Engine-internal
    //     cell ids -> rows-only gate; recall measured by q45. ---
    Q("q44_ann_ivf",
      (s, dir) => ivfTopK(s, dir, nQueries = 5, k = 10, nprobe = 3)
        .orderBy(col("query_id"), col("rank")),
      None),

    // --- trained coarse quantizer: distributed Lloyd iterations
    //     (operators.KMeans — map-side assignment against broadcast
    //     centroids, one (cluster, dim) hash agg per round, only k x d
    //     doubles ever reach the driver). The trained upgrade of q44's
    //     label-cell stand-in. Float-mean accumulation order is
    //     partition-dependent -> rows-only gate; the operator's contract
    //     (blob recovery, inertia descent, determinism) is pinned by
    //     KMeansSpec. ---
    Q("q46_kmeans_clusters",
      (s, dir) => {
        val all = vecs(s, dir)
        val cents = graft.operators.KMeans.fit(all, "v", "vec_id",
          k = 8, iters = 3)
        val byCluster = cents.zipWithIndex.map { case (c, i) =>
          struct(
            (lit(c.map(x => x * x).sum) -
              lit(2.0) * graft.functions.vec_dot(col("v"), typedLit(c.toSeq)) +
              graft.functions.vec_dot(col("v"), col("v"))).as("d2"),
            lit(i).as("i"))
        }
        all
          .select(array_min(array(byCluster: _*)).as("m"))
          .select(col("m.i").as("cluster"), col("m.d2").as("d2"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_vecs"),
            round(avg(col("d2")), 2).as("avg_sq_dist"))
          .orderBy(col("cluster"))
      },
      None),

    // --- product-quantized ANN (the memory-side half of IVF-PQ): vectors
    //     compressed to 8 one-byte codes (8 codebooks x 16 centroids over
    //     8-dim subvectors, trained by operators.KMeans), queries scored
    //     against CODES ONLY via ADC — per query an 8x16 distance table
    //     ships as literals and each candidate costs 8 lookups + adds, no
    //     vector math. At 100 TB the codes (8 B/vec vs 512 B/vec) are what
    //     fits hot storage. Trained model -> rows-only; recall vs exact
    //     measured by q48. ---
    Q("q47_ann_pq",
      (s, dir) => pqTopK(s, dir, nQueries = 5, k = 10)
        .orderBy(col("query_id"), col("rank")),
      None),

    // --- recall@10 of the PQ path vs brute force (the q43/q45 twin for
    //     the compressed index). Context for reading the number: the
    //     synthetic embeddings are near-isotropic — beyond the top ~3
    //     neighbors, cosine gaps are <0.02, so 64-bit codes genuinely
    //     can't separate rank 5 from rank 15 (distance concentration).
    //     Clustered real-world embeddings sit far from this worst case. ---
    Q("q48_pq_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = pqTopK(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- IVF-PQ: the composed index (trained coarse cells for pruning +
    //     PQ codes for scoring) — the shape a 100 TB ANN deployment
    //     actually runs. ADC tables travel as COLUMNS of the broadcast
    //     probe frame (PQ.adcLookup), so the plan is one branch for any
    //     number of queries. Engine-internal model -> rows-only gate;
    //     recall vs exact measured by q49b. ---
    Q("q49_ann_ivfpq",
      (s, dir) => ivfPqTopK(s, dir, nQueries = 5, k = 10, nprobe = 3)
        .orderBy(col("query_id"), col("rank")),
      None),

    // --- recall@10 of the composed IVF-PQ path vs brute force: the
    //     product of the cell-pruning loss (q45) and the code-compression
    //     loss (q48), measured in-engine like its siblings ---
    Q("q49b_ivfpq_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = ivfPqTopK(s, dir, nQueries = 5, k = 10, nprobe = 3)
          .select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- two-stage retrieval: IVF-PQ ADC shortlist, then exact cosine
    //     re-rank of the shortlist against the true vectors — the
    //     standard production composition. ADC distances are
    //     approximations, so rank inversions near the cut are recovered
    //     by re-scoring; only `shortlist` full vectors per query are ever
    //     fetched (vs the whole corpus for brute force), which at 100 TB
    //     is the difference between touching codes + a few dozen vectors
    //     and scanning the embedding store. ---
    Q("q49c_ivfpq_rerank",
      (s, dir) => ivfPqRerank(s, dir, nQueries = 5, k = 10, nprobe = 3,
        shortlist = 30).orderBy(col("query_id"), col("rank")),
      None),

    // --- recall@10 of the re-ranked path: must dominate q49b whenever
    //     the true neighbor made the ADC shortlist (IvfIndexSpec asserts
    //     the dominance) ---
    Q("q49d_rerank_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = ivfPqRerank(s, dir, nQueries = 5, k = 10, nprobe = 3,
          shortlist = 30).select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- IVF-PQ index storage round trip: write partitionBy(cell)
    //     parquet, read back, probe, and compare against the in-memory
    //     plan row-for-row (n_match must equal k for every query —
    //     self-verifying, see [[ivfPqIndexRoundTrip]]). IvfIndexSpec
    //     proves the layout PRUNES; this proves the full round trip.
    //     Engine-internal index -> rows-only gate. ---
    Q("q49e_ivfpq_index_roundtrip",
      (s, dir) => ivfPqIndexRoundTrip(s, dir, nQueries = 5, k = 10, nprobe = 3),
      None),

    // --- incremental index maintenance: a new ingest batch is encoded
    //     against the FROZEN (base-trained) models and APPENDED to the
    //     cell-partitioned index; retrieval must match a single-shot
    //     encode of the union row-for-row (n_match == k per query —
    //     self-verifying, see [[ivfPqIncrementalAppend]]). Engine-internal
    //     index -> rows-only gate; IvfIndexSpec proves base files survive
    //     the append byte-identical. ---
    Q("q49f_ivfpq_incremental",
      (s, dir) => ivfPqIncrementalAppend(s, dir, nQueries = 5, k = 10, nprobe = 3),
      None),

    // --- recall@10 of the IVF path vs brute force (the q43 twin for the
    //     coarse-quantizer index; rows-only for the same reason) ---
    Q("q45_ivf_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = ivfTopK(s, dir, nQueries = 5, k = 10, nprobe = 3)
          .select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- PCA spectrum of the embedding table (operators.PCA): ONE
    //     distributed pass folds [n, sums, upper-tri second moments] into
    //     a single d(d+3)/2+1-double buffer (typed Aggregator — partial
    //     agg map-side, only buffers cross the shuffle); the 64x64
    //     eigensolve is driver-side Jacobi. Per component: eigenvalue and
    //     cumulative variance ratio — the k-selection curve an embedding
    //     store reads before choosing its reduced width. Float summation
    //     order -> rows-only gate (the q46 reasoning); PCASpec pins
    //     planted-axis recovery, partition-invariance, and
    //     projected-variance == eigenvalue. ---
    Q("q93_pca_spectrum",
      (s, dir) => {
        val model = memoFit(s, dir, "pca-16")(
          graft.operators.PCA.fit(vecs(s, dir), "v", k = 16))
        val total = model.eigenvalues.sum
        val rows = model.eigenvalues.take(16).zipWithIndex.map { case (ev, j) =>
          (j, BigDecimal(ev).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble,
            BigDecimal(model.eigenvalues.take(j + 1).sum / total)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toSeq
        import s.implicits._
        rows.toDF("component", "eigenvalue", "cum_variance_ratio")
          .orderBy(col("component"))
      },
      None),

    // --- recall@10 of brute-force kNN run in PCA-REDUCED space (16 of 64
    //     dims) vs full-space exact — measures what the 4x cheaper scan
    //     (and 4x smaller index) costs in retrieval quality; the
    //     projection is map-side codegen'd vec_dot against broadcast
    //     component literals, then the q40 scan shape over short vectors.
    //     The in-engine metric IS the verification (q43 pattern). The
    //     harness embeddings are near-ISOTROPIC (q93's spectrum is flat:
    //     16 dims ~ 21% of variance), PCA's worst case by construction —
    //     so low recall here is the honest reading; real embedding tables
    //     have effective rank << d and the same plan keeps most variance
    //     (PCASpec proves recovery when planted structure exists). ---
    Q("q93b_pca_knn_recall",
      (s, dir) => {
        val model = memoFit(s, dir, "pca-16")(
          graft.operators.PCA.fit(vecs(s, dir), "v", k = 16))
        val proj = vecs(s, dir).select(col("vec_id"),
          graft.operators.PCA.project(col("v"), model).as("v"))
        val q = proj.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        val reduced = rankBySimDesc(
          proj.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id"),
              cosine_sim(col("qv"), col("v")).as("sim")),
          10).select(col("query_id"), col("vec_id"))
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        exact.join(reduced.withColumn("hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- matryoshka truncation recall (Kusupati et al. 2022): recall@10
    //     of cosine top-k computed on the vector PREFIX (dims 8/16/32)
    //     against the full 64-dim ranking — the measurement behind
    //     truncating an MRL-trained embedding store to cut the 100 TB
    //     vector footprint 2-8×. The scored cross frame materializes once
    //     (localCheckpoint) and feeds all four dims; each dim's top-k is
    //     the bounded-heap aggregate, and the recall join runs on
    //     dims×queries×k rows. Fully oracled (dim 64 vs itself pins the
    //     1.0 anchor). ---
    Q("q132_matryoshka_recall",
      (s, dir) => {
        val dims = Seq(8, 16, 32, 64)
        val (nQ, k) = (5, 10)
        val all = vecs(s, dir)
        val q = all.filter(col("vec_id") < nQ)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        val cross = all.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
          .localCheckpoint()
        val perDim = dims.map { d =>
          rankBySimDesc(
            cross.select(col("query_id"), col("vec_id"),
              cosine_sim(slice(col("qv"), 1, d), slice(col("v"), 1, d))
                .as("sim")), k)
            .select(lit(d).as("dim"), col("query_id"), col("vec_id"))
        }.reduce(_ unionByName _).localCheckpoint()
        val ref = perDim.filter(col("dim") === dims.max)
          .select(col("query_id"), col("vec_id"))
        perDim.join(ref, Seq("query_id", "vec_id"), "left_semi")
          .groupBy(col("dim"))
          .agg(round(count(lit(1)).cast("double") / (nQ * k), 4)
            .as("recall_at_10"))
          .orderBy(col("dim"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
             |           FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e
             |      WHERE vec_id < 5),
             |d AS (SELECT unnest([8,16,32,64]) AS dim),
             |s AS (SELECT dim, query_id, vec_id,
             |        list_cosine_similarity(qv[1:dim], v[1:dim]) AS sim
             |      FROM e CROSS JOIN q CROSS JOIN d
             |      WHERE vec_id <> query_id),
             |r AS (SELECT dim, query_id, vec_id,
             |        row_number() OVER (PARTITION BY dim, query_id
             |          ORDER BY sim DESC, vec_id) AS rnk
             |      FROM s),
             |tk AS (SELECT dim, query_id, vec_id FROM r WHERE rnk <= 10),
             |ref AS (SELECT query_id, vec_id FROM tk WHERE dim = 64)
             |SELECT dim::INT AS dim,
             |       round(count(*) / 50.0, 4) AS recall_at_10
             |FROM tk JOIN ref USING (query_id, vec_id)
             |GROUP BY dim ORDER BY dim""".stripMargin)),

    // --- hard-negative mining for contrastive training (the in-batch /
    //     BM25-negative upgrade path of DPR, Karpukhin et al. 2020): per
    //     query vector, the top-5 most-similar vectors of a DIFFERENT
    //     label (the hard negatives) alongside the nearest SAME-label
    //     vector (the positive), and the margin between them — the
    //     triplet-mining report that decides whether a contrastive batch
    //     is trivial or informative. Same broadcast nested-loop shape as
    //     q40 (queries tiny by contract, corpus never shuffles; bounded-
    //     heap top_k per (query, side)); the positive join is
    //     queries-sized. Fully oracled. ---
    Q("q136_hard_negatives",
      (s, dir) => {
        val all = vecs(s, dir)
        val q = all.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
            col("v").as("qv"))
        val scored = all.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qlabel"), col("label"),
            col("vec_id"),
            round(cosine_sim(col("qv"), col("v")), 4).as("sim"))
          .localCheckpoint()
        val negs = rankBySimDesc(
          scored.filter(col("label") =!= col("qlabel"))
            .select(col("query_id"), col("vec_id"), col("sim")), 5)
        val pos = rankBySimDesc(
          scored.filter(col("label") === col("qlabel"))
            .select(col("query_id"), col("vec_id"), col("sim")), 1)
          .select(col("query_id"), col("sim").as("pos_sim"))
        negs.join(broadcast(pos), "query_id")
          .select(col("query_id"), col("rank"), col("vec_id"),
            col("sim").as("neg_sim"), col("pos_sim"),
            round(col("pos_sim") - col("sim"), 4).as("margin"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             |           FROM embeddings),
             |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
             |      FROM e WHERE vec_id < 5),
             |s AS (SELECT query_id, qlabel, label, vec_id,
             |        round(list_cosine_similarity(qv, v), 4) AS sim
             |      FROM e CROSS JOIN q WHERE vec_id <> query_id),
             |n AS (SELECT query_id, vec_id, sim,
             |        row_number() OVER (PARTITION BY query_id
             |          ORDER BY sim DESC, vec_id) AS rank
             |      FROM s WHERE label <> qlabel),
             |p AS (SELECT query_id, sim AS pos_sim,
             |        row_number() OVER (PARTITION BY query_id
             |          ORDER BY sim DESC, vec_id) AS rnk
             |      FROM s WHERE label = qlabel)
             |SELECT query_id, rank::INT AS rank, vec_id,
             |       sim AS neg_sim, pos_sim,
             |       round(pos_sim - sim, 4) AS margin
             |FROM n JOIN (SELECT query_id, pos_sim FROM p WHERE rnk = 1)
             |  USING (query_id)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- embedding-space label separation WITHOUT touching pairs: for
    //     unit vectors the mean pairwise intra-label cosine has the closed
    //     form (‖Σv‖² − n)/(n(n−1)) and the label↔rest mean cosine is
    //     (Σℓ·(Σtot−Σℓ))/(nℓ·(N−nℓ)) — the cluster-quality report
    //     (silhouette's two ingredients) from ONE pass of d-dimensional
    //     sums, no N² join anywhere. Scale shape: posexplode to
    //     (label, dim, x) and partial+final sum — the only shuffle carries
    //     labels×d rows; everything after runs on the labels-sized frame.
    //     The report says whether labels form tight, separated clusters
    //     (high intra − inter margin ⇒ label-conditioned sampling and the
    //     q41/q121 centroid machinery are meaningful on this corpus). ---
    Q("q147_label_separation",
      (s, dir) => {
        val u = unitVecs(s, dir)
        val sums = u
          .select(col("label"), posexplode(col("v")).as(Seq("d", "x")))
          .groupBy(col("label"), col("d")).agg(sum(col("x")).as("sx"))
          .localCheckpoint()
        val perLabel = sums.groupBy(col("label"))
          .agg(sum(col("sx") * col("sx")).as("s2"))
          .join(u.groupBy(col("label")).agg(count(lit(1)).as("n")), "label")
        val cross = sums.groupBy(col("d")).agg(sum(col("sx")).as("st"))
        val dotTot = sums.join(broadcast(cross), "d")
          .groupBy(col("label"))
          .agg(sum(col("sx") * col("st")).as("dot_tot"))
        val nTot = u.agg(count(lit(1)).as("n_tot"))
        perLabel.join(dotTot, "label").crossJoin(broadcast(nTot))
          .select(col("label"), col("n"),
            round((col("s2") - col("n")) / (col("n") * (col("n") - 1)), 4)
              .as("intra_mean"),
            round((col("dot_tot") - col("s2"))
              / (col("n") * (col("n_tot") - col("n"))), 4).as("inter_mean"),
            round((col("s2") - col("n")) / (col("n") * (col("n") - 1))
              - (col("dot_tot") - col("s2"))
                / (col("n") * (col("n_tot") - col("n"))), 4).as("margin"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |            embedding::DOUBLE[] AS v FROM embeddings),
             |u AS (SELECT vec_id, label,
             |        [x / sqrt(list_sum([y*y for y in v])) for x in v] AS v
             |      FROM e),
             |ex AS (SELECT label, generate_subscripts(v, 1) AS d,
             |         unnest(v) AS x FROM u),
             |sums AS (SELECT label, d, sum(x) AS sx FROM ex GROUP BY 1,2),
             |pl AS (SELECT label, sum(sx*sx) AS s2 FROM sums GROUP BY 1),
             |nl AS (SELECT label, count(*) AS n FROM u GROUP BY 1),
             |tot AS (SELECT d, sum(sx) AS st FROM sums GROUP BY 1),
             |dt AS (SELECT label, sum(sx*st) AS dot_tot
             |       FROM sums JOIN tot USING (d) GROUP BY 1),
             |nt AS (SELECT count(*) AS n_tot FROM u)
             |SELECT label, n,
             |  round((s2 - n) / (n * (n - 1)), 4) AS intra_mean,
             |  round((dot_tot - s2) / (n * (n_tot - n)), 4) AS inter_mean,
             |  round((s2 - n) / (n * (n - 1))
             |    - (dot_tot - s2) / (n * (n_tot - n)), 4) AS margin
             |FROM pl JOIN nl USING (label) JOIN dt USING (label)
             |  CROSS JOIN nt ORDER BY label""".stripMargin)),

    // --- 1-bit binary quantization + Hamming shortlist + exact re-rank:
    //     the 64-d unit vector packs its SIGN BITS into ONE long (64× the
    //     512-byte vector's compression; the modern BQ retrieval trick —
    //     on the unit sphere sign agreement tracks cosine). Candidate
    //     scoring is xor + popcount over a single long column — the
    //     cheapest scan any index here runs; true vectors move only in
    //     the id-keyed re-rank join of the shortlist (q49c's two-stage
    //     staging). Engine-internal bit layout → rows-only; q185b is the
    //     self-verifying recall gate. ---
    Q("q185_bq_topk",
      (s, dir) => bqTopK(s, dir, nQueries = 5, k = 10, shortlist = 150)
        .orderBy(col("query_id"), col("rank")),
      None),

    // --- recall@10 of the BQ shortlist+rerank vs brute-force cosine (the
    //     acceptance bar for shipping 8-byte signatures instead of
    //     512-byte vectors) ---
    Q("q185b_bq_recall",
      (s, dir) => {
        val exact = knn(s, dir, nQueries = 5, k = 10)
          .select(col("query_id"), col("vec_id"))
        val bq = bqTopK(s, dir, nQueries = 5, k = 10, shortlist = 150)
          .select(col("query_id"), col("vec_id"))
        exact.join(bq.withColumn("hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 10.0).as("recall_at_10"))
          .orderBy(col("query_id"))
      },
      None),

    // --- leave-one-out 1-NN label accuracy: predict each vector's label
    //     from its nearest neighbor (cosine, self excluded) and score
    //     against truth — the standard embedding-quality probe (a good
    //     embedding space puts same-label points together; near-random
    //     accuracy means the labels aren't locally
    //     separable). Bounded 500-vector slice, the documented q35/q39
    //     all-pairs contract: one broadcast side, quadratic only within
    //     the slice; the full-corpus path is this query over the q44 IVF
    //     candidates instead of the cross join. ---
    Q("q203_knn_loo_accuracy",
      (s, dir) => {
        val e = fanout(Tables(s, dir, "embeddings"))
          .filter(col("vec_id") < 500)
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .localCheckpoint()
        // nearest neighbor as a partial-aggregated struct-min (lexicographic
        // (-sim, nbr_id) == the (sim desc, id asc) rank-1 row) — no 250k-row
        // per-key window sort anywhere in the plan
        e.as("a")
          .join(broadcast(e.select(col("vec_id").as("nbr_id"),
            col("label").as("nbr_label"), col("v").as("nv"))),
            col("vec_id") =!= col("nbr_id"))
          .select(col("vec_id"), col("label"),
            struct(
              (-round(cosine_sim(col("v"), col("nv")), 6)).as("ns"),
              col("nbr_id").as("ni"), col("nbr_label").as("nl")).as("cand"))
          .groupBy(col("vec_id"), col("label"))
          .agg(min(col("cand")).as("m"))
          .select(col("label"), col("m.nl").as("nbr_label"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("nbr_label") === col("label"), 1L).otherwise(0L))
              .as("n_correct"),
            round(sum(when(col("nbr_label") === col("label"), 1L)
              .otherwise(0L)) / count(lit(1)).cast("double"), 4).as("acc"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             |           FROM embeddings WHERE vec_id < 500),
             |p AS (SELECT a.vec_id, a.label, b.vec_id AS nbr_id,
             |        b.label AS nbr_label,
             |        round(list_cosine_similarity(a.v, b.v), 6) AS sim
             |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
             |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
             |        ORDER BY sim DESC, nbr_id) AS rk FROM p)
             |SELECT label, count(*) AS n,
             |  sum(CASE WHEN nbr_label = label THEN 1 ELSE 0 END)::BIGINT
             |    AS n_correct,
             |  round(sum(CASE WHEN nbr_label = label THEN 1 ELSE 0 END)
             |    / count(*)::DOUBLE, 4) AS acc
             |FROM r WHERE rk = 1 GROUP BY label ORDER BY label""".stripMargin)),

    // --- FILTERED retrieval, exact twin: top-5 cosine among candidates
    //     passing a metadata predicate (doc lang = 'en', metadata joined
    //     vec_id = doc_id). The predicate lands BEFORE scoring — a
    //     metadata semi-join ahead of the broadcast query cross, so
    //     non-matching vectors are never scored. This is the
    //     "filtered vector search" contract every retrieval stack needs
    //     (RAG with tenant/language/source constraints). ---
    Q("q200_filtered_knn",
      (s, dir) => {
        val meta = Tables(s, dir, "documents")
          .select(col("doc_id").as("vec_id"), col("lang"))
        val cand = vecs(s, dir)
          .join(meta.filter(col("lang") === "en"), Seq("vec_id"), "left_semi")
        val q = vecs(s, dir).filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        rankBySimDesc(
          cand.crossJoin(broadcast(q))
            .filter(col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id"),
              round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
          5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |c AS (SELECT e.* FROM e JOIN documents d ON e.vec_id = d.doc_id
             |      WHERE d.lang = 'en'),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             |scored AS (
             |  SELECT query_id, c.vec_id,
             |         round(list_cosine_similarity(qv, v), 4) AS sim
             |  FROM c CROSS JOIN q WHERE c.vec_id <> query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, sim,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY sim DESC, vec_id) AS rank
             |  FROM scored)
             |SELECT query_id, vec_id, sim, rank FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- filtered ANN: the same predicate PRE-FILTERS the IVF index
    //     (semi-join on the assigned frame BEFORE the probe join), so
    //     pruning compounds — only probed cells' rows that also pass the
    //     filter are scored. Pre- vs post-filtering is the classic
    //     filtered-ANN design choice: post-filtering k results can return
    //     fewer than k; pre-filtering keeps k guarantees at the cost of
    //     scoring selectivity * cell fraction of the corpus. Recall
    //     measured against the q200 exact twin (engine-internal trained
    //     quantizer -> rows-only, the q45 pattern). ---
    Q("q200b_filtered_ivf_recall",
      (s, dir) => {
        val meta = Tables(s, dir, "documents")
          .select(col("doc_id").as("vec_id"), col("lang"))
        val en = meta.filter(col("lang") === "en")
        val all = unitVecs(s, dir)
        val cents = ivfCentroidsCached(s, dir)
        val assigned = ivfAssign(all, cents)
          .join(en, Seq("vec_id"), "left_semi")
        val probes = probeCells(
          all.filter(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"), col("v").as("qv")),
          cents, nprobe = 3)
        val ann = rankBySimDesc(
          assigned.join(broadcast(probes), Seq("cell"))
            .filter(col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id"),
              round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
          5).select(col("query_id"), col("vec_id"))
        val exact = Catalog.byName("q200_filtered_knn").fn(s, dir)
          .select(col("query_id"), col("vec_id"))
        exact.join(ann.withColumn("hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0))) / 5.0).as("recall_at_5"))
          .orderBy(col("query_id"))
      },
      None)
  )

  /** Sign-bit packing: dim i of the unit vector sets bit i of one long
    * (64 dims == 64 bits exactly). SQL-lambda form because shiftleft's
    * bit count must be the lambda variable. */
  private val BqBitsSql =
    "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
      "acc | IF(v[i] > CAST(0 AS DOUBLE), shiftleft(1L, i), 0L))"

  /** Binary-quantized top-k (see q185): Hamming shortlist over packed
    * sign bits, then exact cosine re-rank of the shortlist only. */
  private def bqTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
      shortlist: Int): DataFrame = {
    val all = unitVecs(s, dir).select(col("vec_id"), col("v"))
    val packed = all.withColumn("bits", expr(BqBitsSql))
    val q = packed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bits").as("q_bits"))
    val ham = packed.drop("v").crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("CAST(bit_count(bits ^ q_bits) AS DOUBLE)").as("adc"))
    val short = rankByAdcAsc(ham, shortlist)
      .select(col("query_id"), col("vec_id"))
    val qv = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    rankBySimDesc(
      short.join(all, "vec_id").join(broadcast(qv), "query_id")
        .select(col("query_id"), col("vec_id"),
          round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
      k)
  }

  private val NumCells    = 8
  private val CoarseIters = 3

  /** Trained models memoized per (session, table dir). The recall family
    * (q43/q45/q48/q49b/q49d) runs an exact AND an ANN side, and the
    * two-stage path layers ivfPqTopK inside ivfPqRerank — without
    * memoization each such query re-runs the KMeans/PQ training jobs two
    * to four times. Fits are deterministic (seeded init, fixed iteration
    * count, order-insensitive double sums NOT guaranteed — but identical
    * INPUT plans at the same dir produce identical partitionings in one
    * session, so the memo returns what an uncached re-fit of the same call
    * site would), so caching measures retrieval instead of training and
    * cannot change results. Values are driver-side models, a few KB each
    * (k×d centroids / m×k×(d/m) codebooks); keys use the session's identity
    * hash rather than the session itself so a stopped session isn't pinned
    * by the map. */
  private val fitCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), AnyRef]

  private[queries] def memoFit[A <: AnyRef](s: SparkSession, dir: String,
      tag: String)(f: => A): A =
    fitCache.computeIfAbsent((System.identityHashCode(s), dir, tag),
      _ => f).asInstanceOf[A]

  /** Trained coarse quantizer for the IVF index: distributed Lloyd
    * iterations over the unit-normalized corpus (operators.KMeans — only
    * k×d doubles ever reach the driver). Replaces round 3's per-label mean
    * stand-in. */
  private[queries] def ivfCentroids(all: DataFrame): Array[Array[Double]] =
    graft.operators.KMeans.fit(all, "v", "vec_id",
      k = NumCells, iters = CoarseIters)

  /** [[ivfCentroids]] over the unit-normalized corpus, memoized. */
  private def ivfCentroidsCached(s: SparkSession, dir: String): Array[Array[Double]] =
    memoFit(s, dir, "ivf-centroids")(ivfCentroids(unitVecs(s, dir)))

  /** Nearest-cell assignment for every vector — the IVF index body
    * (vec_id, v, cell). Entirely map-side: the k×d centroid model rides
    * the plan as literals and the per-row argmin is the codegen'd
    * struct-argmin kernel ([[graft.operators.KMeans.nearestCentroid]]).
    * No join, no window, no exchange — the round-3 crossJoin +
    * row_number() version pushed a k× expansion of the corpus through a
    * full shuffle just to keep one row per vector. */
  private[queries] def ivfAssign(all: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    all.select(col("vec_id"), col("v"),
      graft.operators.KMeans.nearestCentroid(col("v"), cents)
        .cast("long").as("cell"))

  /** Each query's `nprobe` nearest cells, also map-side: the k scored
    * cells form an in-row struct array that is sorted and sliced — no
    * window over an expanded frame. (|qv|² is dropped: constant per row.) */
  private def probeCells(queries: DataFrame,
      cents: Array[Array[Double]], nprobe: Int): DataFrame = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val d = lit(c.map(x => x * x).sum) -
        lit(2.0) * graft.functions.vec_dot(col("qv"), typedLit(c.toSeq))
      struct(d.as("d"), lit(i.toLong).as("cell"))
    }
    queries.select(col("query_id"), col("qv"),
        explode(slice(array_sort(array(scored: _*)), 1, nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
  }

  /** Two-stage retrieval: take the IVF-PQ ADC top-`shortlist`, join back
    * the true vectors for ONLY those ids, and re-rank by exact cosine
    * against the broadcast query set. See q49c for the shape rationale. */
  private[graft] def ivfPqRerank(s: SparkSession, dir: String, nQueries: Int,
      k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val all = unitVecs(s, dir)
    val short = ivfPqTopK(s, dir, nQueries, shortlist, nprobe)
      .select(col("query_id"), col("vec_id"))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    rankBySimDesc(
      short.join(all.select(col("vec_id"), col("v")), "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"),
          round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
      k)
  }

  private def ivfTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val all   = unitVecs(s, dir)
    val cents = ivfCentroidsCached(s, dir)
    val assigned = ivfAssign(all, cents)
    val probes = probeCells(
      all.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv")),
      cents, nprobe)
    rankBySimDesc(
      assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosine_sim(col("qv"), col("v")), 4).as("sim")),
      k)
  }

  /** IVF-PQ — the composed 100 TB ANN shape: the trained coarse quantizer
    * prunes the search to `nprobe` cells AND the pruned candidates are
    * scored against PQ codes only. The PQ codebooks are trained on and
    * encode RESIDUALS (v − centroid(cell)) — textbook IVF-ADC: residuals
    * concentrate near the origin, so the same 16-byte budget quantizes a
    * much smaller ball than raw vectors. The asymmetry lands on the probe
    * side for free: each (query, probed cell) row of the broadcast frame
    * carries the ADC table of THAT cell's residual query (qv − centroid),
    * still an `array<double>` column scored by one
    * [[graft.operators.PQ.adcLookup]] plan branch — thousands of queries
    * are rows, not unioned subplans. At cluster scale `coded` is the
    * parquet index written partitionBy(cell) (IvfIndexSpec proves the
    * probe prunes to the probed cells' files) and each probe reads
    * ~nprobe/k of the codes — neither the vectors nor the codes of
    * unprobed cells are touched. */
  private def ivfPqTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val (cents, pq, coded) = ivfPqIndex(s, dir)
    ivfPqScore(coded, ivfPqProbes(s, dir, nQueries, nprobe, cents, pq), pq, k)
  }

  /** The trained IVF-PQ index: (coarse centroids, PQ residual model, the
    * coded frame (vec_id, cell, codes)) — the frame a 100 TB deployment
    * writes partitionBy(cell) as the persistent index (q49e does exactly
    * that and reads it back). */
  private def ivfPqIndex(s: SparkSession, dir: String)
      : (Array[Array[Double]], graft.operators.PQ.Model, DataFrame) = {
    val all   = unitVecs(s, dir)
    val cents = ivfCentroidsCached(s, dir)
    val pq = memoFit(s, dir, "pq-residual")(
      graft.operators.PQ.fit(ivfResiduals(all, cents), "rv", "vec_id",
        m = PqM, k = PqK, iters = 3))
    (cents, pq, ivfPqEncode(all, cents, pq))
  }

  /** Residual view of a vector frame: (vec_id, cell, rv = v − centroid
    * (cell)), the per-row centroid fetched from the k×d model literal by
    * cell index — all map-side. */
  private[queries] def ivfResiduals(vectors: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    ivfAssign(vectors, cents).select(col("vec_id"), col("cell"),
      zip_with(col("v"), element_at(centLit, col("cell").cast("int") + 1),
        (x, c) => x - c).as("rv"))
  }

  /** Assign + residual-encode a vector frame against FROZEN models — the
    * map-side index-maintenance kernel: an ingest batch becomes index rows
    * (vec_id, cell, codes) with no training pass and no exchange. */
  private[queries] def ivfPqEncode(vectors: DataFrame,
      cents: Array[Array[Double]],
      pq: graft.operators.PQ.Model): DataFrame =
    ivfResiduals(vectors, cents).select(col("vec_id"), col("cell"),
      graft.operators.PQ.encode(col("rv"), pq).as("codes"))

  /** The broadcast probe frame: each query's `nprobe` nearest cells with
    * the residual-query ADC table of THAT cell as an array column — one
    * plan branch for any query count. */
  private def ivfPqProbes(s: SparkSession, dir: String, nQueries: Int,
      nprobe: Int, cents: Array[Array[Double]],
      pq: graft.operators.PQ.Model): DataFrame = {
    import s.implicits._
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    collectQueries(unitVecs(s, dir), nQueries).toSeq.flatMap { case (qid, qv) =>
      cents.zipWithIndex.map { case (c, i) => (d2(qv, c), i.toLong, c) }
        .sortBy(t => (t._1, t._2)).take(nprobe)
        .map { case (_, cell, c) =>
          val rq = qv.indices.map(i => qv(i) - c(i)).toArray
          (qid, cell, graft.operators.PQ.adcTable(pq, rq).toSeq)
        }
    }.toDF("query_id", "cell", "adc_table")
  }

  /** ADC scoring of a coded index frame against a probe frame. */
  private def ivfPqScore(coded: DataFrame, probes: DataFrame,
      pq: graft.operators.PQ.Model, k: Int): DataFrame =
    rankByAdcAsc(
      coded.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          graft.operators.PQ.adcLookup(col("codes"), col("adc_table"), pq)
            .as("adc")),
      k)

  /** q49e body: the index's full storage round trip. The coded frame is
    * WRITTEN partitionBy(cell) as parquet — the persistent layout whose
    * partition pruning IvfIndexSpec proves — read back, probed, and the
    * read-back retrieval compared row-for-row against the in-memory plan:
    * n_match == k proves schema, partition-column typing, and code
    * fidelity survive the round trip (both plans share the deterministic
    * (adc, vec_id) tie-break, so any disagreement is a storage defect). */
  private[queries] def ivfPqIndexRoundTrip(s: SparkSession, dir: String,
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val (cents, pq, coded) = ivfPqIndex(s, dir)
    val probes = ivfPqProbes(s, dir, nQueries, nprobe, cents, pq)
    val idxDir = scratchDir("ivfpq-idx")
    coded.write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    // the partition column comes back via directory inference (int) —
    // restore the written long type
    val back = s.read.parquet(idxDir)
      .select(col("vec_id"), col("cell").cast("long").as("cell"), col("codes"))
    val mem  = ivfPqScore(coded, probes, pq, k)
    val disk = ivfPqScore(back, probes, pq, k).withColumn("hit", lit(1))
    mem.join(disk, Seq("query_id", "vec_id", "rank"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_match"),
        count(lit(1)).as("k"))
      .orderBy(col("query_id"))
  }

  /** q49f body: incremental index maintenance — the production story
    * between "train once" (q49) and "full rebuild" (q49e). The corpus
    * splits into a BASE, on which the coarse centroids and residual PQ
    * codebooks are trained and the partitionBy(cell) index is first
    * written, and an ingest DELTA (vec_id ≡ 3 mod 5). The delta is
    * encoded against the FROZEN models — pure map-side, no training
    * pass — and APPENDED to the cell-partitioned parquet: append drops
    * new files into existing cell directories (or creates new ones)
    * without rewriting a byte of the base index, so nightly ingest cost
    * is proportional to the batch, not the index. Gate: retrieval over
    * the post-append index equals, row for row, a single-shot encode of
    * the full corpus under the same frozen models (n_match == k per
    * query — both plans share the deterministic (adc, vec_id) tie-break,
    * so any disagreement is a maintenance defect, not rounding).
    * IvfIndexSpec additionally proves the append leaves every base file
    * untouched on disk. */
  private[queries] def ivfPqIncrementalAppend(s: SparkSession, dir: String,
      nQueries: Int, k: Int, nprobe: Int,
      indexDir: Option[String] = None): DataFrame = {
    val all     = unitVecs(s, dir)
    val isDelta = col("vec_id") % 5 === 3
    val base    = all.filter(!isDelta)
    val cents = memoFit(s, dir, "ivf-centroids-base")(ivfCentroids(base))
    val pq = memoFit(s, dir, "pq-residual-base")(
      graft.operators.PQ.fit(ivfResiduals(base, cents), "rv", "vec_id",
        m = PqM, k = PqK, iters = 3))
    val idxDir = indexDir.getOrElse(scratchDir("ivfpq-incr"))
    ivfPqEncode(base, cents, pq)
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    // the maintenance operation under test: frozen-model encode + append
    ivfPqEncode(all.filter(isDelta), cents, pq)
      .write.mode("append").partitionBy("cell").parquet(idxDir)
    val back = s.read.parquet(idxDir)
      .select(col("vec_id"), col("cell").cast("long").as("cell"), col("codes"))
    val probes  = ivfPqProbes(s, dir, nQueries, nprobe, cents, pq)
    val incr    = ivfPqScore(back, probes, pq, k)
    val rebuild = ivfPqScore(ivfPqEncode(all, cents, pq), probes, pq, k)
      .withColumn("hit", lit(1))
    incr.join(rebuild, Seq("query_id", "vec_id", "rank"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_match"),
        count(lit(1)).as("k"))
      .orderBy(col("query_id"))
  }
}
