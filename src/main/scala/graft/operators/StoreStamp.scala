package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass replacement for the store stamp checks'
  * `distinct().limit(2).collect()` scan (r19): every store load ran a
  * full hash-distinct — a map-side scan PLUS an exchange — just to
  * learn whether one column holds exactly one value. A min/max/nulls
  * aggregate answers the same question in one partial-aggregating pass
  * with a one-row result and no exchange; at 100 TB the stamp column
  * scan is the irreducible part, the distinct exchange never was.
  *
  * Returns the same "up to two distinct values, null included" view
  * the checks match on: one element when the column is a single
  * non-null value everywhere, and (any) two elements otherwise, so the
  * callers' `length == 1 && head == stamp` requires behave exactly as
  * before (min/max ignore nulls, hence the explicit null count —
  * a {null, "x"} column must still read as mixed).
  */
private[graft] object StoreStamp {
  def distinctVals(df: DataFrame, colName: String): Seq[String] = {
    val st = df.agg(
      min(col(colName)).as("mn"), max(col(colName)).as("mx"),
      sum(when(col(colName).isNull, 1L).otherwise(0L)).as("nn")).head()
    val mn = st.getString(0)
    val mx = st.getString(1)
    val hasNull = !st.isNullAt(2) && st.getLong(2) > 0
    if (mn == null) {
      // min null ⇒ every value null (or the table is empty: no rows,
      // no nulls — distinct() of nothing was empty, keep that shape)
      if (hasNull) Seq(null) else Seq.empty
    } else if (mn == mx && !hasNull) Seq(mn)
    else if (mn == mx) Seq(mn, null)
    else Seq(mn, mx)
  }
}
