package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd VecDot kernel must be bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order-function fold it
  * replaces — q35's DuckDB oracle hashes rounded sims, so even 1-ulp drift
  * in accumulation order would surface as a gate failure. */
class VecDotSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("VecDot is bit-identical to the HOF fold on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      (Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
    val diffs = df.select(
        graft.functions.vec_dot($"a", $"b").as("native"), hofDot($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diffs == 0)
  }

  test("null semantics: null input, null element, mismatched lengths") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (None, Some(Seq(1.0))),                        // null input
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0)))          // length mismatch
    ).toDF("a", "b")
    val out = df.select(graft.functions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(11.0), None, None))
    val elemNull = spark.sql(
      "SELECT vec_dot(array(1.0d, NULL), array(1.0d, 2.0d)) AS d").head()
    assert(elemNull.isNullAt(0))
  }

  test("VecDot stays inside WholeStageCodegen") {
    import spark.implicits._
    // non-foldable input, or constant folding evaluates VecDot at plan time
    val df = spark.range(3)
      .select(array($"id".cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), $"id".cast("double")).as("b"))
      .select(graft.functions.vec_dot($"a", $"b").as("d"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"expected a WholeStageCodegen span in:\n${df.queryExecution.executedPlan}")
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0))
  }
}
