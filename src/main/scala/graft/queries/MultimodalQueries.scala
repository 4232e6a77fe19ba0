package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Harness surface for the multimodal plumbing: the typed
  * mapPartitions feature-extraction pipeline over binary payloads.
  * Byte counts are oracle-checkable; decoded dimensions come from the
  * deterministic stub decoder (rows-only).
  */
object MultimodalQueries {

  val queries: Seq[Q] = Seq(

    Q("q70_media_bytes",
      (s, dir) => {
        Multimodal.extractFeatures(Multimodal.documentsAsMedia(s, dir))
          .toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id, 'text' AS kind,
             |octet_length(encode(text)) AS n_bytes
             |FROM documents ORDER BY media_id""".stripMargin)),

    Q("q71_media_features",
      (s, dir) => {
        Multimodal.extractFeatures(Multimodal.documentsAsMedia(s, dir))
          .toDF()
          .orderBy(col("media_id"))
      },
      None),

    // --- REAL codec path: a deterministic PNG is encoded per document
    //     (dims = pure function of doc_id) and decoded back via the JDK's
    //     javax.imageio header reader — the round trip is oracled on the
    //     dimension formula, so a broken encoder OR decoder fails the
    //     hash gate. ---
    Q("q77_media_decode",
      (s, dir) => {
        Multimodal.extractFeatures(
            Multimodal.documentsAsPngMedia(s, dir), Multimodal.ImageIoDecoder)
          .toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             |16 + doc_id % 32 AS width,
             |16 + doc_id % 17 AS height
             |FROM documents ORDER BY media_id""".stripMargin))
  )
}
