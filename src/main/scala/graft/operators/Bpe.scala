package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus
  * (Sennrich et al. 2016) — the merge-table construction a large-scale
  * training-data pipeline runs before tokenizing: count adjacent-symbol
  * pairs weighted by word frequency, merge the most frequent pair into
  * one symbol, repeat.
  *
  * Scale shape (100 TB): the corpus is scanned EXACTLY ONCE — the
  * explode+groupBy that builds the word-frequency table (map-side
  * partial agg; output bounded by |vocab|, not corpus rows). Every
  * merge iteration after that runs over the vocab-bounded word/symbol
  * table: pair counting is an in-row HOF explode + partial agg, the
  * argmax is a 1-row sort-limit, and the merge application is an
  * in-row left-to-right fold — no corpus re-scan, no corpus shuffle,
  * ever. The driver loop is bounded by `numMerges` (a tokenizer
  * hyper-parameter, thousands at most), not by data; per-iteration
  * lineage is cut by persisting the new symbol table and releasing the
  * previous one.
  *
  * Symbols are the word's characters plus a terminal `endMark` symbol
  * (the classic `</w>` convention, so merges cannot cross word
  * boundaries and word-final units stay distinct from word-internal
  * ones). Ties in pair frequency break deterministically by
  * lexicographic (a, b) — both engines and both runs of this engine
  * pick the same merge.
  */
object Bpe {

  /** Last iteration-cache slot, evicted on the next train() call —
    * same caller-owned contract as the [[Dedup]] slots.
    */
  private var lastIterCache: Option[DataFrame] = None

  /** Character symbols of a word column plus the terminal `endMark`
    * (omitted when empty): in-row, codegen HOFs only.
    */
  def symbols(word: Column, endMark: String): Column = {
    val chars = transform(sequence(lit(1), length(word)),
      i => substring(word, i, lit(1)).cast("string"))
    if (endMark.isEmpty) chars
    else concat(chars, array(lit(endMark)))
  }

  /** Word-frequency/symbol table `word, freq, syms` — the ONE
    * corpus-sized pass; everything downstream is vocab-bounded.
    */
  def wordSymbolCounts(docs: DataFrame, toksCol: String,
                       endMark: String = "</w>"): DataFrame =
    docs.select(explode(col(toksCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        symbols(col("word"), endMark).as("syms"))

  /** Adjacent-symbol pair counts weighted by word frequency:
    * `a, b, cnt` over a `freq, syms` table. In-row pair explode +
    * partial-agg sum — distinct pairs are bounded by |symbol
    * alphabet|², tiny next to the corpus.
    */
  def pairCounts(wordSyms: DataFrame): DataFrame =
    wordSyms
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
                    element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** One greedy left-to-right merge pass over a symbol array: every
    * adjacent (a, b) becomes the single symbol a+b, never re-merging
    * the freshly made symbol with the next element ("aaa" under (a,a)
    * → ["aa", "a"]). A pure in-row fold — `aggregate` with the output
    * array as accumulator.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    // no-re-merge safety falls out of the fold: the freshly made
    // symbol a+b can never equal `a` (b is non-empty), so the next
    // element cannot see an already-consumed `a` as the tail
    aggregate(syms, array().cast("array<string>"),
      (out, s) => when(
        size(out) >= 1 && element_at(out, -1) === lit(a) && s === lit(b),
        concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(s))))

  /** Train `numMerges` BPE merges: returns the ordered merge list.
    * Driver work per iteration is ONE two-column row (the argmax) —
    * never a table collect; the vocab-bounded symbol table is
    * persisted per iteration with the previous one released.
    */
  def train(docs: DataFrame, toksCol: String, numMerges: Int,
            endMark: String = "</w>"): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var cur = wordSymbolCounts(docs, toksCol, endMark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Bpe.synchronized {
      lastIterCache.foreach(_.unpersist(blocking = false))
      lastIterCache = Some(cur)
    }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      // deterministic argmax: count desc, then lexicographic (a, b)
      val top = pairCounts(cur)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = cur.select(col("word"), col("freq"),
            mergeOnce(col("syms"), a, b).as("syms"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the new table BEFORE releasing the old one so
        // the fold runs once, not once per downstream consumer
        next.count()
        cur.unpersist(blocking = false)
        cur = next
        Bpe.synchronized { lastIterCache = Some(cur) }
      }
      i += 1
    }
    merges.result()
  }

  /** Tokenize a token-array column with a trained merge list: each
    * word's symbols folded through the merges IN ORDER (merge rank =
    * priority), entirely in-row — the merge list is a literal array
    * baked into the plan (a tokenizer's merge table is KBs; at 100 TB
    * the per-row loop is the only cost and there is no shuffle).
    * Output: `idCol, word_pos (1-based), word, pieces`.
    */
  def applyMerges(docs: DataFrame, idCol: String, toksCol: String,
                  merges: Seq[(String, String)],
                  endMark: String = "</w>"): DataFrame = {
    val mergeLits = array(merges.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b")) }: _*)
    val pieces = (word: Column) =>
      aggregate(mergeLits, symbols(word, endMark),
        (acc, m) => aggregate(acc, array().cast("array<string>"),
          (out, s) => when(
            size(out) >= 1 && element_at(out, -1) === m.getField("a") &&
              s === m.getField("b"),
            concat(slice(out, lit(1), size(out) - 1),
              array(concat(m.getField("a"), m.getField("b")))))
            .otherwise(concat(out, array(s)))))
    docs.select(col(idCol), posexplode(col(toksCol)).as(Seq("i", "word")))
      .select(col(idCol), (col("i") + 1).as("word_pos"), col("word"),
        pieces(col("word")).as("pieces"))
  }
}
