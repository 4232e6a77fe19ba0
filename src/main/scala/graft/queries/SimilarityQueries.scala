package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * of the big side; top-k per query is a window over (query, candidate)
  * scores partitioned by query. The LSH variant buckets the corpus by a
  * 16-bit hyperplane signature so each query only scores its bucket; at
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

  private def knn(s: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val all = vecs(s, dir)
    val q   = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine_sim(col("qv"), col("v")), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** PQ ANN: one codebook training pass, one map-side encode, then each
    * query ranks the whole corpus by ADC lookups over the codes column —
    * exact kNN's scan shape but over 8-byte codes instead of 512-byte
    * vectors. Queries are collected driver-side (they're the tiny side by
    * contract) so their distance tables ship as plan literals. */
  private def pqTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int): DataFrame = {
    // L2-normalize first: the exact baseline ranks by COSINE, and on unit
    // vectors L2 order == cosine order, so the ADC tables rank the same
    // neighborhood the baseline does (unnormalized, the two metrics
    // disagree and recall craters — measured 0.2-0.5 vs ~1.0).
    val all = vecs(s, dir).select(col("vec_id"),
      transform(col("v"), x => x / graft.functions.vec_norm(col("v"))).as("v"))
    val model = graft.operators.PQ.fit(all, "v", "vec_id",
      m = 16, k = 16, iters = 3)
    val coded = all.select(col("vec_id"),
      graft.operators.PQ.encode(col("v"), model).as("codes"))
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    queries.map { case (qid, qv) =>
      coded
        .filter(col("vec_id") =!= qid)
        .select(lit(qid).as("query_id"), col("vec_id"),
          graft.operators.PQ.adcDistance(col("codes"), model, qv).as("adc"))
    }.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank"))
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    keyed.join(broadcast(q), Seq("t", "bk"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(cosine_sim(col("qv"), col("v")), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  val queries: Seq[Q] = Seq(

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

    // --- IVF-style ANN: per-label mean vectors act as the coarse
    //     quantizer's cells; every vector is assigned to its NEAREST cell
    //     (map-side vs a broadcast of k centroids), and each query scores
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
      None)
  )

  /** Per-cell centroids (elementwise mean; cells = labels — a stand-in
    * for a trained coarse quantizer). Shared by the IVF query path and the
    * partitioned-index writer. */
  private[queries] def ivfCentroids(all: DataFrame): DataFrame =
    all
      .select(col("label").as("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cv"))

  /** Nearest-cell assignment for every vector (map-side vs broadcast
    * centroids) — the IVF index body: (vec_id, v, cell). */
  private[queries] def ivfAssign(all: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cd").desc, col("cell"))
    all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cell"),
        cosine_sim(col("v"), col("cv")).as("cd"))
      .withColumn("cr", row_number().over(wAssign))
      .filter(col("cr") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
  }

  private def ivfTopK(s: SparkSession, dir: String,
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val all   = vecs(s, dir)
    val cents = ivfCentroids(all)
    val assigned = ivfAssign(all, cents)
    // queries probe their nprobe nearest cells
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cd").desc, col("cell"))
    val probes = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine_sim(col("qv"), col("cv")).as("cd"))
      .withColumn("cr", row_number().over(wProbe))
      .filter(col("cr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine_sim(col("qv"), col("v")), 4).as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
