package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization: compress each `array<double>` vector into m
  * one-byte codes (one per contiguous subvector, each quantized by its own
  * k-centroid codebook trained with [[KMeans]]), and score queries against
  * CODES ONLY via asymmetric distance computation (ADC) — per query, a
  * m×k table of subvector distances is computed once driver-side and
  * shipped as literals, so scoring a candidate is m array lookups + adds
  * instead of a d-dimensional dot product.
  *
  * This is the memory-side half of an IVF-PQ index: at 100 TB the corpus's
  * embeddings (d×8 bytes each) don't fit hot storage, but m bytes of codes
  * do — scan cost drops by ~d·8/m and the scoring loop never touches the
  * original vectors. Recall loss is measured in-engine (q48) against exact
  * kNN, the same honesty contract as the LSH (q43) and IVF (q45) paths.
  */
object PQ {

  /** m codebooks of k centroids, each over d/m dimensions. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def dsub: Int = codebooks(0)(0).length
  }

  /** Train m independent KMeans codebooks on the subvector slices —
    * deterministic for a fixed `idCol` ordering, like KMeans.fit. */
  def fit(vecs: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int, iters: Int): Model = {
    val d = vecs.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    Model((0 until m).map { s =>
      KMeans.fit(
        vecs.select(col(idCol), slice(col(vecCol), s * dsub + 1, dsub).as("v")),
        "v", idCol, k, iters)
    }.toArray)
  }

  /** Code column: the vector's m nearest-codebook-centroid indices (all
    * map-side — m × k codegen'd dot products per row, once at index-build
    * time). */
  def encode(v: Column, model: Model): Column = {
    val dsub = model.dsub
    array(model.codebooks.toSeq.zipWithIndex.map { case (cb, s) =>
      KMeans.nearestCentroid(slice(v, s * dsub + 1, dsub), cb)
    }: _*)
  }

  /** The query's ADC distance tables, flattened: entry `s*k + j` is the
    * squared distance from query subvector `s` to centroid `j` of codebook
    * `s`. Computed driver-side (m×k doubles per query); ship it either as
    * a literal ([[adcDistance]]) or — the scalable path — as a COLUMN of a
    * broadcast query frame, so thousands of queries are rows, not plan
    * branches ([[adcLookup]]). */
  def adcTable(model: Model, query: Array[Double]): Array[Double] = {
    val dsub = model.dsub
    val k    = model.codebooks(0).length
    val out  = new Array[Double](model.m * k)
    var s = 0
    while (s < model.m) {
      val cb = model.codebooks(s)
      var j = 0
      while (j < k) {
        val c = cb(j)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val t = query(s * dsub + i) - c(i); d2 += t * t; i += 1
        }
        out(s * k + j) = d2
        j += 1
      }
      s += 1
    }
    out
  }

  /** ADC distance of a codes column against a flattened [[adcTable]]
    * carried as an `array<double>` COLUMN (one table per query row in a
    * broadcast frame). Plan size is constant in the number of queries —
    * this is what lets IVF-PQ scale past the handful-of-literal-queries
    * contract. Summation order matches [[adcDistance]] (s ascending).
    *
    * `k`/`m` MUST match the encode-time model (tables from a mismatched
    * `k` would mis-offset every lookup); a table whose size != m*k raises
    * at runtime rather than returning NULL distances — NULL sorts FIRST
    * under the ascending orderBy every ANN ranking uses, so a silent NULL
    * would win the ranking instead of erroring. Prefer the [[Model]]
    * overload, which can't disagree with encode. */
  def adcLookup(codes: Column, table: Column, k: Int, m: Int): Column = {
    require(k > 0 && m > 0, s"k=$k and m=$m must be positive")
    val sum = (0 until m).map { s =>
      element_at(table, codes.getItem(s) + lit(s * k) + 1)
    }.reduce(_ + _)
    when(size(table) === m * k, sum)
      .otherwise(raise_error(
        concat(lit(s"adc_table size must be m*k = ${m * k}, got "),
          size(table).cast("string"))))
  }

  /** [[adcLookup]] with k/m taken from the model that produced the codes —
    * the overload that can't silently mis-offset. */
  def adcLookup(codes: Column, table: Column, model: Model): Column =
    adcLookup(codes, table, model.codebooks(0).length, model.m)

  /** ADC approximate squared distance from a DRIVER-SIDE query vector to a
    * codes column: the per-subvector distance tables are evaluated here
    * (m×k doubles) and shipped as literals; per candidate it's m
    * element_at lookups. For many queries prefer [[adcTable]]+[[adcLookup]]
    * (tables as broadcast rows, one plan). */
  def adcDistance(codes: Column, model: Model, query: Array[Double]): Column = {
    val k = model.codebooks(0).length
    adcLookup(codes, typedLit(adcTable(model, query).toSeq), k, model.m)
  }
}
