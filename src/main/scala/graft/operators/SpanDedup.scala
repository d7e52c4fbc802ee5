package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicated-substring coverage — the distributed proxy
  * for suffix-array substring dedup ("Deduplicating Training Data Makes
  * Language Models Better", Lee et al. 2021): a k-token window that
  * appears verbatim in ≥ 2 distinct documents marks all k of its token
  * positions as duplicated; a document's coverage ratio is the fraction
  * of its tokens inside any such window. High coverage = quotes,
  * mirrored passages, licence blocks — the spans suffix-array dedup
  * would cut.
  *
  * Scale shape (100 TB):
  *  - Positioned k-grams explode the corpus ×(len−k+1), but each gram
  *    is immediately reduced to a 32-hex md5 key, so the df aggregation
  *    shuffles bounded keys with map-side partial agg (repeated spans
  *    collapse per-partition — exactly the skewed rows).
  *  - The dup-gram set (df ≥ 2) is the survivor set; the flagging join
  *    is keyed on the same bounded hash, AQE-broadcast when small.
  *  - Span coverage needs NO interval-merge window: each dup gram at
  *    position p covers p..p+k−1, and one doc-keyed count-distinct over
  *    the exploded cover indices merges overlaps by construction. The
  *    explode is bounded by (dup grams × k), i.e. proportional to the
  *    duplicated mass, not the corpus.
  */
object SpanDedup {

  /** (id, pos, k) positioned k-gram hashes of a token-array column;
    * `gk` is md5 of the space-joined window.
    */
  def positionedGrams(docs: DataFrame, idCol: String, toksCol: String,
                      k: Int): DataFrame =
    docs.filter(size(col(toksCol)) >= k)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col(toksCol)) - (k - 1)),
          i => struct(i.as("pos"),
            md5(concat_ws(" ", slice(col(toksCol), i, lit(k)))).as("gk"))))
          .as("g"))
      .select(col(idCol), col("g.pos").as("pos"), col("g.gk").as("gk"))

  /** Per-document duplicated-span coverage: `idCol, n_tokens,
    * covered_tokens, coverage` (round 6). Documents with < k tokens
    * carry no window and are excluded (the caller's contract).
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, toksCol: String,
                      k: Int): DataFrame = {
    val grams = positionedGrams(docs, idCol, toksCol, k)
    val dup = grams.groupBy("gk")
      .agg(countDistinct(col(idCol)).as("gram_df"))
      .filter(col("gram_df") >= 2)
      .select("gk")
    val covered = grams.join(dup, Seq("gk"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("ci"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("ci")).as("covered_tokens"))
    docs.filter(size(col(toksCol)) >= k)
      .select(col(idCol), size(col(toksCol)).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("coverage"))
  }
}
