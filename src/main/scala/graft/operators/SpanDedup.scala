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

  /** Exact-substring dedup by EXCISION — the full Lee et al. operation
    * [[dupSpanCoverage]] only measures: every duplicated k-token window
    * keeps its globally-first occurrence (minimal `idCol` among the
    * docs containing the gram) and is cut everywhere else.
    *
    * Contract: a token position is removed iff some dup gram whose
    * keeper is ANOTHER doc covers it. Overlapping spans union by
    * construction (position-set semantics, no interval merge); the
    * keeper doc keeps its text byte-identical; docs with < k tokens
    * have no window and pass through unchanged.
    *
    * Exactness: gram granularity loses NOTHING vs a true suffix-array
    * span pass — a position lies inside a cross-doc duplicated
    * substring of length ≥ k iff it lies inside some duplicated
    * k-window (a length-L ≥ k duplicated substring contains L−k+1
    * duplicated k-windows jointly covering all L positions, and a
    * duplicated k-window IS such a substring), so under this keeper
    * convention the removal set equals the exact duplicated-span set
    * position-for-position. Pinned against an independent brute-force
    * recompute in SpanExactSpec (measured over-removal: 0 tokens,
    * BASELINE.md round 12); the hash granularity's only approximation
    * is the md5 collision probability on the 32-hex gram key.
    *
    * Output: `idCol, n_tokens, n_removed, clean_text` (space-joined
    * surviving tokens in original order).
    *
    * Scale: the removal set is proportional to the DUPLICATED mass
    * (dup grams × k), not the corpus; reassembly is one doc-keyed agg
    * (collect → in-row sort → join, the [[LineDedup]] shape — no
    * corpus-sized window).
    */
  def removeDupSpans(docs: DataFrame, idCol: String, toksCol: String,
                     k: Int): DataFrame = {
    val grams = positionedGrams(docs, idCol, toksCol, k)
    val dup = grams.groupBy("gk")
      .agg(countDistinct(col(idCol)).as("gram_df"),
           min(col(idCol)).as("keeper"))
      .filter(col("gram_df") >= 2)
      .select("gk", "keeper")
    // distinct (id, position) removal set — overlaps union here
    val rm = grams.join(dup, Seq("gk"))
      .filter(col(idCol) =!= col("keeper"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("ci"))
      .distinct()
    val rmN = rm.groupBy(col(idCol)).agg(count(lit(1)).as("n_removed"))
    // 1-based positions to match positionedGrams
    val toks = docs.select(col(idCol),
        posexplode(col(toksCol)).as(Seq("i", "tok")))
      .select(col(idCol), (col("i") + 1).as("ci"), col("tok"))
    val clean = toks.join(rm, Seq(idCol, "ci"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ci"), col("tok")))),
        s => s.getField("tok")), " ").as("clean_text"))
    docs.select(col(idCol), size(col(toksCol)).cast("long").as("n_tokens"))
      .join(rmN, Seq(idCol), "left")
      .join(clean, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

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
