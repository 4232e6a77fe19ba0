package graft.operators

import graft.SparkSpec

class CompressionSignalSpec extends SparkSpec {

  test("deflate ratio orders repetition << prose << noise and is stable") {
    import spark.implicits._
    val rep = ("spam ham " * 200).trim
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across a wide field looking for something new to chase " +
      "while the sun slowly sets behind the distant hills of the valley"
    // deterministic pseudo-noise (no RNG in tests): splitmix64 chain —
    // statistically flat, so deflate can find no structure
    var x = 0L
    val noise = (0 until 400).map { _ =>
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      ((z & 0x7fffffffL) % 94 + 33).toChar
    }.mkString
    val docs = Seq((1L, rep), (2L, prose), (3L, noise), (4L, ""))
      .toDF("doc_id", "text")
    val out = CompressionSignal.ratios(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (repLen, _, repRatio) = out(1L)
    val (_, _, proseRatio) = out(2L)
    val (_, _, noiseRatio) = out(3L)
    assert(repLen == rep.getBytes("UTF-8").length.toLong)
    assert(repRatio < 0.1, s"repetition should crush: $repRatio")
    assert(proseRatio > repRatio && proseRatio < noiseRatio)
    assert(noiseRatio > 0.5, s"noise should barely compress: $noiseRatio")
    assert(out(4L)._1 == 0L && out(4L)._3 == 0.0) // empty text: ratio 0
    // determinism: a second pass produces identical rows
    val again = CompressionSignal.ratios(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == out.map { case (k, v) => k -> v._3 })
  }
}
