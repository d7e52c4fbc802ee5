package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
  * — the MOSS algorithm): hash every k-gram, slide a w-hash window,
  * select the minimum hash in each window, and keep the distinct
  * selected values as the document's fingerprint set. Guarantees: any
  * shared run of ≥ w + k − 1 tokens contributes at least one SHARED
  * fingerprint, and the density of selected hashes is ~2/(w+1) — the
  * locality property ad-hoc rolling-hash sampling (mod-p selection)
  * does not have.
  *
  * Hashes are the md5-prefix integers every cross-engine gate uses
  * (pure content arithmetic — replayable in the DuckDB oracle,
  * retry-stable at scale). Selecting by VALUE-distinct makes tie
  * handling irrelevant (the paper's rightmost-tie rule exists to pick
  * one POSITION; the value set is identical either way).
  *
  * Scale shape (100 TB): the entire selection is in-row higher-order
  * functions over each doc's own token array — gram hashes, window
  * minima, distinct — inside whole-stage codegen with NO shuffle, no
  * explode amplification (the w× window overlap is computed over an
  * in-row array, never materialized as rows). The only exchange is
  * whatever the caller does with the fingerprint sets (e.g. explode +
  * group by fingerprint to find near-dups — bounded by fingerprint
  * density ~2/(w+1), not gram count).
  */
object Winnow {

  /** Per-document selected-fingerprint SETS: `idCol, n_grams, fps`
    * (array of distinct selected hashes) — the building block
    * [[fingerprints]] digests and [[sharedFingerprintPairs]] joins on.
    */
  def fpSets(docs: DataFrame, idCol: String, toksCol: String,
             k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")
    val nToks = size(col(toksCol))
    // in-row gram hash array: h_i = int(md5(gram_i)[0:8], 16)
    val grams = transform(sequence(lit(1), nToks - (k - 1)),
      i => conv(substring(md5(concat_ws(" ",
        slice(col(toksCol), i, lit(k)))), 1, 8), 16, 10).cast("long"))
    docs.filter(nToks >= k)
      .select(col(idCol), grams.as("gh"))
      .select(col(idCol),
        size(col("gh")).cast("long").as("n_grams"),
        // windows of w hashes (short docs: one window over all grams),
        // min per window, value-distinct
        array_distinct(transform(
          sequence(lit(1), greatest(lit(1), size(col("gh")) - (w - 1))),
          p => array_min(slice(col("gh"), p, lit(w))))).as("fps"))
  }

  /** Per-document winnowing fingerprints: `idCol, n_grams, n_fps,
    * fp_digest` where `fp_digest` is md5 over the sorted distinct
    * selected hashes (space-joined) — a stable set identity. Docs with
    * fewer than k tokens carry no gram and are excluded (the
    * [[SpanDedup.positionedGrams]] contract).
    */
  def fingerprints(docs: DataFrame, idCol: String, toksCol: String,
                   k: Int, w: Int): DataFrame =
    fpSets(docs, idCol, toksCol, k, w)
      .select(col(idCol), col("n_grams"),
        size(col("fps")).cast("long").as("n_fps"),
        md5(array_join(transform(array_sort(col("fps")),
          h => h.cast("string")), " ")).as("fp_digest"))

  /** Near-dup candidate pairs by shared winnowing fingerprints — the
    * MOSS match step: docs sharing ≥ `minShared` selected fingerprints,
    * with the shared count. By the winnowing guarantee any pair sharing
    * a ≥ w+k−1-token verbatim run shares a fingerprint and is a
    * candidate.
    *
    * CONTRACT: run exact dedup first. Identical docs share their
    * entire fingerprint set, so every exact-dup group of size g
    * multiplies every one of its buckets by g — C(g,2) pairs per
    * shared fingerprint, BELOW the maxBucket cap where the guard
    * cannot help (measured in ProfileCuration: a clone-heavy corpus
    * burned >45 min where the deduped one took 109 s). No fingerprint
    * scheme should ever see exact duplicates; `md5(text)`
    * dropDuplicates upstream is one cheap shuffle.
    *
    * Scale shape — ONE corpus scan, no self-join: group the exploded
    * fingerprint stream (~2/(w+1) of the gram stream) by value into
    * doc-id buckets, drop buckets outside [2, maxBucket] (a fingerprint
    * held by more docs than `maxBucket` is site-wide boilerplate — the
    * same bounded-bucket trade as the minhash LSH guard, [[Dedup]]),
    * then emit each bucket's C(n,2) pairs IN-ROW from the sorted id
    * array. Pair volume is bounded by buckets·maxBucket²/2, never
    * corpus-quadratic, and per-row work by maxBucket² — the equivalent
    * equi-self-join plans the fingerprint pipeline four times (both
    * join sides plus both frequency-filter sides); this shape computes
    * it once and shuffles only on `fp` and then `(id_a, id_b)`.
    */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String,
                             toksCol: String, k: Int, w: Int,
                             minShared: Int = 2,
                             maxBucket: Long = 200L): DataFrame = {
    val ex = fpSets(docs, idCol, toksCol, k, w)
      .select(col(idCol).as("id"), explode(col("fps")).as("fp"))
    val buckets = ex.groupBy("fp")
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= lit(maxBucket))
    // each fingerprint contributes a pair at most once (ids is a set),
    // so count(*) per pair == distinct shared fingerprints
    val pairs = buckets.select(explode(flatten(transform(col("ids"),
      (a, i) => transform(
        slice(col("ids"), i + lit(2), size(col("ids"))),
        b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
    pairs.groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
