package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication — the CCNet-style boilerplate pass a
  * web-scale training corpus gets before document-level dedup: a line
  * (nav bars, cookie banners, footers) that recurs across ≥ minDocFreq
  * distinct documents is removed from every document that carries it.
  *
  * Scale shape (100 TB):
  *  - One explode (docs → lines) feeding a hash aggregation keyed on
  *    `md5(line)` — a 32-hex key, so shuffle width is bounded per line
  *    regardless of line length, and map-side partial aggregation
  *    collapses each partition's duplicate lines before the exchange.
  *    (md5 is also the cross-engine contract the DuckDB oracle replays;
  *    both Md5 and the aggregation are whole-stage-codegen'd.)
  *  - The common-line set is the df-filter's survivors — boilerplate,
  *    a tiny fraction of distinct lines — so the flagging join's build
  *    side is small; AQE broadcasts it when it fits, and when it does
  *    not the join stays key-distributed on the same bounded md5 key.
  *  - Reassembly is ONE doc-keyed aggregation: collect (pos, line)
  *    structs, sort in-row, join. No window over the corpus, no
  *    per-line shuffle back.
  * Heavy-tail lines ("", "Home", "© 2024") are exactly the rows the df
  * aggregation collapses map-side, so line-frequency skew lands on the
  * partial-agg path, not on a hot shuffle partition.
  */
object LineDedup {

  /** Documents exploded to (id, pos, line) on newline boundaries. */
  def explodeLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  /** Per-document line-dedup result: `idCol, n_lines, n_dropped,
    * clean_text` — clean_text is the document with every line whose
    * distinct-document frequency ≥ minDocFreq removed, original line
    * order preserved. Documents whose every line is boilerplate stay in
    * the output with clean_text = "" (a drop decision belongs to the
    * caller's filter, not silently to the operator).
    */
  def dropCommonLines(docs: DataFrame, idCol: String, textCol: String,
                      minDocFreq: Long): DataFrame = {
    val lines = explodeLines(docs, idCol, textCol)
      .withColumn("k", md5(col("line")))
    val common = lines.groupBy("k")
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") >= minDocFreq)
      .select("k")
    // Left join against the (small) boilerplate set; collect_list skips
    // the nulls the `when` emits for dropped lines, so one aggregation
    // yields totals AND the reassembled text.
    lines.join(common.withColumn("is_common", lit(1)), Seq("k"), "left")
      .withColumn("dropped",
        when(col("is_common").isNotNull, 1).otherwise(0))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("dropped")).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("dropped") === 0, struct(col("pos"), col("line"))))),
            e => e.getField("line")),
          "\n").as("clean_text"))
  }
}
