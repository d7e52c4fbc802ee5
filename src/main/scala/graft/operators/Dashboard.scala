package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dashboard's analytics surface (SURVEY.md §3.3,
  * /root/reference/streamlit_app.py) as a parameterized query layer:
  * every widget interaction in the reference re-runs pandas over the
  * whole frame; here each interaction is plan-reuse with changed
  * literals over one cached DataFrame.
  *
  *  - filter domains: per-column distinct+sort (streamlit_app.py:144-151)
  *  - selection filter: conjunctive IN-lists (streamlit_app.py:166-170)
  *  - KPI row: count / null-safe means (streamlit_app.py:180-190)
  *  - grouped counts for the two bar charts (streamlit_app.py:205,215)
  *  - empty-selection guard (streamlit_app.py:172-174)
  *
  * `cached` is the reference's @st.cache_data (S8): call once per
  * session over the cleaned frame, reuse across interactions.
  */
object Dashboard {

  /** S8 — memoize the cleaned frame across interactions. */
  def cached(df: DataFrame): DataFrame = df.cache()

  /** A6 — the selectable value domain of one column, sorted, nulls out.
    *
    * The collect is bounded BY CONSTRUCTION: a filter widget is only
    * meaningful for low-cardinality columns (the reference's real
    * domains are 167 cities / 36 makes), but at 100 TB an unbounded
    * distinct-collect on the wrong column would OOM the driver, so the
    * plan fetches `maxDomain + 1` rows and raises — naming the column
    * and the cap — when the domain exceeds the cap. The sort sits
    * BETWEEN the distinct and the limit, so Catalyst plans a
    * TakeOrderedAndProject over the deduped domain (per-partition
    * top-k + merge, never a full sort materialization) and the capped
    * prefix is DETERMINISTIC — an unsorted distinct-limit would return
    * an arbitrary subset, breaking A6's sorted contract exactly when
    * the cap binds. The driver-side `.sorted` is gone: order is the
    * plan's (binary collation), not re-imposed post-collect.
    */
  def filterDomain(df: DataFrame, column: String,
                   maxDomain: Int = 10000): Seq[String] = {
    val domain = df.select(col(column).cast("string")).na.drop()
      .distinct().orderBy(asc(column)).limit(maxDomain + 1)
      .collect().map(_.getString(0)).toSeq
    if (domain.length > maxDomain)
      throw new IllegalArgumentException(
        s"filterDomain('$column') exceeds $maxDomain distinct values — " +
        "not a filter-widget column; raise maxDomain explicitly if intended")
    domain
  }

  /** F3 — conjunction of IN-list selections; empty selection for a
    * column means "no constraint" (multiselect default-all semantics).
    */
  def selectionFilter(selections: Map[String, Seq[String]]): Column =
    selections.filter(_._2.nonEmpty).foldLeft(lit(true)) {
      case (acc, (c, vals)) => acc && col(c).isin(vals: _*)
    }

  def applySelections(df: DataFrame,
                      selections: Map[String, Seq[String]]): DataFrame =
    df.filter(selectionFilter(selections))

  /** F6 — the empty-result guard. */
  def isEmptySelection(df: DataFrame): Boolean = df.isEmpty

  /** A4 — KPI row. Spark's avg is null-ignoring natively, which replaces
    * the reference's hand-rolled notna() guards; rounding matches its
    * display rounding (streamlit_app.py:181-189).
    */
  def kpis(df: DataFrame, countCol: String, avgCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as(s"total_$countCol") +:
      avgCols.map(c => round(avg(col(c)), 1).as(s"avg_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A1/A2 — the chart feeds: count per group, ordered for display. */
  def groupedCounts(df: DataFrame, groupCol: String,
                    topK: Int = 0): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(groupCol))
    if (topK > 0) counts.limit(topK) else counts
  }
}
