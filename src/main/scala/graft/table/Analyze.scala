package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics — the optimizer-facing stats recipe
  * (row count, null count, exact NDV, min/max rendered as strings) as a
  * queryable one-pass operator: the engine's own manifests carry
  * footer-level min/max (`SnapshotTable.parquetIntStats`); this is the
  * table-level companion a cost-based planner or a data-quality audit
  * reads.
  *
  * Scale shape: ONE full-table pass computing every per-column aggregate
  * in a single `agg` (all partial-aggregated map-side; `count_distinct`
  * shuffles only (column-tag, value) partials), then a generated
  * unpivot of the 1-row result — no window, no second scan. For
  * columns whose exact NDV is itself data-sized at 10^12 rows the HLL
  * sketch (q121) is the documented estimate path; exact NDV here is the
  * audit/certificate form. */
object Analyze {

  /** Per-column stats of `cols`: (column, n_rows, n_nulls, ndv, min_s,
    * max_s) — min/max rendered via CAST AS STRING so one schema carries
    * every column type. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }
}
