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

    // --- feature extraction over binary payloads (documents-as-media:
    //     payload = UTF-8 text bytes). Oracle: both per-payload folds are
    //     small-multiplier mod-2^64 recurrences — the checksum
    //     (crc*1000003 + byte, the q53 HUGEINT list_reduce technique) and
    //     the stub decoder's dimension hash (h*31 + byte from 17, then
    //     width = (h & 0x3ff)+16 = h mod 1024 + 16 and height the next
    //     10 bits) — so the whole feature row is cross-engine checkable.
    //     ASCII corpus: byte == codepoint (the q53 BMP caveat). ---
    Q("q71_media_features",
      (s, dir) => {
        Multimodal.extractFeatures(Multimodal.documentsAsMedia(s, dir))
          .toDF()
          .orderBy(col("media_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |  [unicode(ch)::HUGEINT FOR ch IN string_split(text,'')] AS bs,
             |  octet_length(encode(text))::BIGINT AS n_bytes FROM documents),
             |f AS (SELECT doc_id, n_bytes,
             |  list_reduce(list_prepend(0::HUGEINT, bs),
             |    (a, b) -> (a*1000003 + b) % 18446744073709551616::HUGEINT)
             |    AS crc_u,
             |  list_reduce(list_prepend(17::HUGEINT, bs),
             |    (a, b) -> (a*31 + b) % 18446744073709551616::HUGEINT) AS h_u
             |  FROM d)
             |SELECT doc_id AS media_id, 'text' AS kind, n_bytes,
             |  CASE WHEN crc_u >= 9223372036854775808::HUGEINT
             |       THEN (crc_u - 18446744073709551616::HUGEINT)::BIGINT
             |       ELSE crc_u::BIGINT END AS checksum,
             |  (h_u % 1024 + 16)::INTEGER AS width,
             |  ((h_u // 1024) % 1024 + 16)::INTEGER AS height
             |FROM f ORDER BY media_id""".stripMargin)),

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
             |FROM documents ORDER BY media_id""".stripMargin)),

    // --- fixed-stride frame sampling (the video/audio-window decode
    //     SHAPE, codec stubbed as a byte slice): per-frame fan-out from
    //     one Generate, payloads never shuffled. The gate verifies the
    //     sampling GEOMETRY (frame count, offsets, tail-frame lengths)
    //     against byte-length arithmetic DuckDB can reproduce; the
    //     in-plan frame fingerprints are pinned by MultimodalSpec. ---
    Q("q186_frame_sample",
      (s, dir) => {
        Multimodal.strideFrames(
            Multimodal.documentsAsMedia(s, dir).toDF(),
            frameLen = 128, stride = 96)
          .filter(col("media_id") < 50)
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("offset").cast("long").as("offset"),
            col("frame_len").cast("long").as("frame_len"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |             octet_length(encode(text)) AS n_bytes
             |           FROM documents WHERE doc_id < 50),
             |f AS (SELECT media_id, n_bytes,
             |        unnest(range(0, greatest(
             |          ceil(n_bytes / 96.0)::BIGINT, 1))) AS frame_idx
             |      FROM m)
             |SELECT media_id, frame_idx, frame_idx * 96 AS offset,
             |  least(128, n_bytes - frame_idx * 96) AS frame_len
             |FROM f WHERE least(128, n_bytes - frame_idx * 96) > 0
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // --- perceptual image dedup end-to-end: encode a pattern PNG per doc
    //     (band walk = bits of doc_id % 16), REAL pixel decode
    //     (ImageIO.read), area-average 9x8 downscale, 64-bit dHash, group
    //     identical hashes into duplicate clusters. The pattern is
    //     hash-grid-aligned, so images sharing doc_id % 16 are perceptual
    //     duplicates ACROSS their differing dimensions — the oracle states
    //     the resulting 16-cluster structure as pure doc_id arithmetic,
    //     and a broken encoder, pixel decoder, downscaler, or hasher all
    //     break the equality. Payloads are hashed map-side in the same
    //     typed mapPartitions (only 8-byte hashes reach the shuffle);
    //     near-dup (small Hamming distance) extends via q34's SimHash
    //     pigeonhole machinery unchanged. ---
    Q("q198_phash_dedup",
      (s, dir) => {
        import s.implicits._
        Multimodal.documentsAsPatternPngMedia(s, dir)
          .mapPartitions(rows =>
            rows.map(r => (r.media_id, Multimodal.dHash64(r.payload))))
          .toDF("media_id", "phash")
          .groupBy(col("phash"))
          .agg(min(col("media_id")).as("min_id"),
            count(lit(1)).as("n_images"))
          .select(col("min_id"), col("n_images"))
          .orderBy(col("min_id"))
      },
      Some("""SELECT min(doc_id) AS min_id, count(*) AS n_images
             |FROM documents
             |GROUP BY doc_id % 16
             |ORDER BY min_id""".stripMargin)),

    // --- NEAR-duplicate images at small Hamming distance over the q198
    //     hashes, via a pigeonhole banded join (q34's machinery pointed
    //     at the image domain). dHash bit columns are the semantic unit
    //     (column gx compares the same neighbor pair in every row), so
    //     bands gather COLUMN CLASSES — band r = bits {r, r+8, .., r+56},
    //     extracted in one mask as (phash >> r) & 0x0101..01. Eight
    //     column-bands guarantee recall for any pair differing in <= 7
    //     columns (each differing bit dirties at most one band) — which
    //     covers both arbitrary Hamming <= 7 and the column-concentrated
    //     differences dHash produces on vertically-uniform content, the
    //     case gated here: pattern hashes repeat the 8-bit signature in
    //     all rows, so Hamming = 8 * popcount(sig XOR sig') and the
    //     <= 8 near-dups are exactly the 1-column-apart signatures,
    //     stated arithmetically by the DuckDB oracle via bit_count.
    //     Candidates are cluster-representative-sized; exact popcount
    //     verification removes band false positives. ---
    Q("q198b_phash_neardup",
      (s, dir) => {
        import s.implicits._
        val reps = Multimodal.documentsAsPatternPngMedia(s, dir)
          .mapPartitions(rows =>
            rows.map(r => (r.media_id, Multimodal.dHash64(r.payload))))
          .toDF("media_id", "phash")
          .groupBy(col("phash")).agg(min(col("media_id")).as("min_id"))
          .localCheckpoint()
        val colMask = 0x0101010101010101L
        val banded = reps.select(col("min_id"), col("phash"),
          explode(array((0 until 8).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("phash"), b).bitwiseAND(lit(colMask))
                .as("bh"))): _*)).as("k"))
          .select(col("min_id"), col("phash"),
            col("k.band").as("band"), col("k.bh").as("bh"))
        banded.as("a")
          .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
              && col("a.min_id") < col("b.min_id"))
          .select(col("a.min_id").as("id_a"), col("b.min_id").as("id_b"),
            col("a.phash").as("ha"), col("b.phash").as("hb"))
          .distinct()
          .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 8)
          .select(col("id_a"), col("id_b"),
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
              .as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH r AS (
             |  SELECT doc_id % 16 AS p, min(doc_id) AS min_id
             |  FROM documents GROUP BY 1)
             |SELECT a.min_id AS id_a, b.min_id AS id_b,
             |  8 * bit_count(xor(a.p, b.p)) AS hamming
             |FROM r a JOIN r b ON a.min_id < b.min_id
             |WHERE 8 * bit_count(xor(a.p, b.p)) <= 8
             |ORDER BY id_a, id_b""".stripMargin)),

    // --- windowed signal energy (the audio VAD shape, codec stubbed as
    //     byte frames per the multimodal policy): 64-byte frames, RMS of
    //     the sample values per frame, silence flag at the median-split
    //     threshold. The per-frame math runs IN-ROW (sequence + transform
    //     + aggregate HOFs over the frame slice — no per-sample explode,
    //     no shuffle); frames of a doc never leave its row until the
    //     final narrow projection. Corpus text is pure ASCII, so
    //     char-indexed substr == byte offsets on both engines and the
    //     oracle states the identical arithmetic. Bounded to 20 docs —
    //     the gate checks MATH, not scale; the plan is a single Generate
    //     at any corpus size. ---
    Q("q199_frame_energy",
      (s, dir) => {
        graft.Tables(s, dir, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id").as("media_id"), col("text"))
          .select(col("media_id"),
            explode(sequence(lit(0L),
              ceil(length(col("text")) / 64.0).cast("long") - 1)).as("frame_idx"),
            col("text"))
          .select(col("media_id"), col("frame_idx"),
            expr("substr(text, cast(frame_idx * 64 + 1 as int), 64)").as("fb"))
          .filter(length(col("fb")) > 0)
          .select(col("media_id"), col("frame_idx"),
            // codepoint_energy (round 12): the per-char ascii(substr)^2
            // aggregate fold — ~4 interpreted nodes per CHARACTER —
            // fused into one codegen'd decode loop (bit-identical,
            // FoldKernelsSpec; sqrt/round stay built-in so the
            // arithmetic order is unchanged)
            round(sqrt(graft.functions.codepoint_energy(col("fb"))
                / length(col("fb"))), 4).as("rms"))
          .withColumn("silent", (col("rms") < 99.0).cast("int"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text FROM documents
             |           WHERE doc_id < 20),
             |f AS (SELECT media_id,
             |        unnest(range(0, ceil(len(text) / 64.0)::BIGINT))
             |          AS frame_idx, text
             |      FROM m),
             |fr AS (SELECT media_id, frame_idx,
             |         substr(text, (frame_idx * 64 + 1)::INT, 64) AS fb
             |       FROM f),
             |r AS (SELECT media_id, frame_idx,
             |        round(sqrt(list_sum(
             |          [ascii(substr(fb, i::INT, 1))::DOUBLE
             |             * ascii(substr(fb, i::INT, 1))
             |           for i in range(1, len(fb) + 1)])
             |          / len(fb)), 4) AS rms
             |      FROM fr WHERE len(fb) > 0)
             |SELECT media_id, frame_idx, rms, (rms < 99.0)::INT AS silent
             |FROM r ORDER BY media_id, frame_idx""".stripMargin)),

    // --- voice-activity segments from q199's frames: maximal runs of
    //     consecutive NON-silent frames, the gaps-and-islands composition
    //     (frame_idx − rank within loud frames is the island key). One
    //     extra window + agg over the frames frame — segmentation is the
    //     part a real VAD adds over raw energy, and it's pure relational
    //     machinery on top of the in-row DSP. ---
    Q("q199b_loud_segments",
      (s, dir) => {
        val frames = Catalog.byName("q199_frame_energy").fn(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("frame_idx"))
        frames.filter(col("silent") === 0)
          .withColumn("grp",
            col("frame_idx") - row_number().over(w))
          .groupBy(col("media_id"), col("grp"))
          .agg(min(col("frame_idx")).as("seg_start"),
            count(lit(1)).as("n_frames"),
            round(avg(col("rms")), 4).as("seg_rms"))
          .select(col("media_id"), col("seg_start"), col("n_frames"),
            col("seg_rms"))
          .orderBy(col("media_id"), col("seg_start"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text FROM documents
             |           WHERE doc_id < 20),
             |f AS (SELECT media_id,
             |        unnest(range(0, ceil(len(text) / 64.0)::BIGINT))
             |          AS frame_idx, text
             |      FROM m),
             |fr AS (SELECT media_id, frame_idx,
             |         substr(text, (frame_idx * 64 + 1)::INT, 64) AS fb
             |       FROM f),
             |r AS (SELECT media_id, frame_idx,
             |        round(sqrt(list_sum(
             |          [ascii(substr(fb, i::INT, 1))::DOUBLE
             |             * ascii(substr(fb, i::INT, 1))
             |           for i in range(1, len(fb) + 1)])
             |          / len(fb)), 4) AS rms
             |      FROM fr WHERE len(fb) > 0),
             |loud AS (SELECT media_id, frame_idx, rms,
             |           frame_idx - row_number() OVER (
             |             PARTITION BY media_id ORDER BY frame_idx) AS grp
             |         FROM r WHERE rms >= 99.0)
             |SELECT media_id, min(frame_idx) AS seg_start,
             |  count(*) AS n_frames, round(avg(rms), 4) AS seg_rms
             |FROM loud GROUP BY media_id, grp
             |ORDER BY media_id, seg_start""".stripMargin))
  )
}
