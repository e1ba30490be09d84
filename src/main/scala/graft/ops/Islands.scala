package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gaps-and-islands run numbering — the shared core of every
  * "collapse consecutive equal values into runs" operator (state
  * intervals, the SCD2 build): lag-change flag + running sum, per
  * partition, over a caller-chosen total order. Per-partition windows
  * only: bounded history per key, no global funnel.
  */
object Islands {

  /** df + 1-based run id in `out`: increments whenever `valCol` differs
    * from the previous row's value within `partCol`, ordered by
    * `ordCols` (must be a total order within the partition, or runs are
    * nondeterministic).
    */
  def withRunId(df: DataFrame, partCol: String, ordCols: Seq[String],
                valCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(ordCols.map(col): _*)
    val prev = lag(valCol, 1).over(w)
    df.withColumn("__chg",
        when(prev.isNull || col(valCol) =!= prev, 1L).otherwise(0L))
      .withColumn(out, sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__chg")
  }
}
