package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkSpec

/** Count-Min sketch (q97's machinery): the aggregate the engine ships for
  * point-frequency queries holds CMS's defining guarantees on a stream
  * with known exact counts, and the merge-able aggregate is
  * partition-invariant (counter addition commutes). */
class CmsSpec extends SparkSpec {

  private def sketchBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 7)").as("cms"))
      .head().getAs[Array[Byte]](0)

  test("estimates are one-sided and within eps * stream length") {
    import spark.implicits._
    // zipf-ish known counts: token t_i appears 1000 / i times
    val stream = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val df = stream.toDF("tok")
    val cms = CountMinSketch.readFrom(sketchBytes(df))
    val eps = 0.01
    val total = stream.size
    (1 to 50).foreach { i =>
      val exact = 1000 / i
      val est = cms.estimateCount(s"t$i")
      assert(est >= exact, s"t$i: CMS must never under-estimate")
      assert(est - exact <= eps * total * 3,
        s"t$i: over-estimate ${est - exact} breaks the eps bound (x3 slack)")
    }
    // never-seen items estimate within the same additive bound
    assert(cms.estimateCount("never") <= eps * total * 3)
  }

  test("the aggregate is partition-invariant (sketches byte-equal)") {
    import spark.implicits._
    val stream = (1 to 40).flatMap(i => Seq.fill(i * 3)(s"w$i"))
    val one = sketchBytes(stream.toDF("tok").coalesce(1))
    val many = sketchBytes(stream.toDF("tok").repartition(7))
    assert(java.util.Arrays.equals(one, many))
  }
}
