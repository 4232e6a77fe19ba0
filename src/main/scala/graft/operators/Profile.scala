package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiler — the `ANALYZE TABLE`-shaped data-quality
  * surface: for each requested column, row count, null count, and exact
  * distinct cardinality, from ONE aggregate over ONE scan.
  *
  * All per-column aggregates ride a single `agg` call: Spark plans the
  * multiple DISTINCT aggregates as one Expand (each input row fans out to
  * |cols|+1 tagged rows) over a single scan — the cost is ×(|cols|+1) rows
  * through the first partial aggregate, never a second pass over storage.
  * At 100 TB profile the columns you need, not the whole schema, and swap
  * `count_distinct` for `approx_count_distinct` on the same plan when ±2%
  * is acceptable (the exact form is what the DuckDB gate can verify).
  * The 1-row aggregate result is exploded into per-column rows driver-free.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    val base = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("__n") - col(s"__nn_$c")).as("null_count"),
        col(s"__nd_$c").as("n_distinct"),
        col("__n").as("n_rows"))
    }
    base.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
