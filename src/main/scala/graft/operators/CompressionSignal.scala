package graft.operators

import java.util.zip.Deflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document compressibility as a quality signal: the deflate ratio
  * (compressed bytes / raw bytes) is a cheap, language-agnostic detector
  * of boilerplate and machine-generated repetition — highly repetitive
  * text compresses far below natural prose, and near-random noise sits at
  * ~1.0. Used alongside the explicit repetition fractions (q57/q57b) in
  * large-scale filtering pipelines because it catches structures n-gram
  * rules miss (templated markup, log spam, table dumps).
  *
  * Scale shape: pure map-side — one Deflater per PARTITION, reset per row
  * (allocation-free steady state), payloads never shuffle. Deterministic
  * for a fixed level on a fixed runtime (zlib output is a pure function
  * of input, level, and strategy) => rows-only gate; the spec pins the
  * ordering invariants (repetition << prose << noise).
  */
object CompressionSignal {

  /** Adds `raw_len`, `comp_len`, `ratio` (rounded to 4) per row of
    * `textCol`. Empty text gets ratio 0. */
  def ratios(docs: DataFrame, textCol: String = "text",
      level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new Deflater(level, /* nowrap = */ true)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          defl.reset()
          defl.setInput(raw)
          defl.finish()
          var comp = 0L
          while (!defl.finished()) comp += defl.deflate(buf)
          val ratio =
            if (raw.length == 0) 0.0
            else BigDecimal(comp.toDouble / raw.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, raw.length.toLong, comp, ratio)
        }
      }
      .toDF("doc_id", "raw_len", "comp_len", "ratio")
  }
}
