package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Table A1) — the standard pre-training
  * quality gate that catches templated/boilerplate/spam documents the
  * cross-document dedup family cannot see (a doc that repeats ITSELF is
  * unique corpus-wide):
  *
  *   - duplicate line fraction / duplicate line CHARACTER fraction
  *   - fraction of characters in the most frequent {2,3,4}-gram
  *   - fraction of characters inside duplicated {5..10}-grams
  *     (overlap-aware position coverage, the Gopher definition)
  *
  * Everything is a per-row array program over the doc's own lines and
  * tokens — no shuffle, no UDFs; at 100 TB the cost is a pure map over
  * the corpus scan.
  *
  * PERFORMANCE SHAPE (the reason this is a staged DataFrame API, not
  * bare Column formulas): Spark evaluates higher-order functions
  * interpreted, and any non-trivial subexpression referenced INSIDE a
  * lambda body is re-evaluated per element. The naive nested
  * filter-count (`cnt(g) = size(filter(grams, _ === g))`) is O(L²)
  * per doc with an interpreter-sized constant, and even a sorted
  * formulation re-sorts per element if the sorted array is an inline
  * expression (both measured: sf0.1 ran 10+ minutes single-task).
  * [[withSignals]] therefore binds every intermediate (gram arrays,
  * sorted copies, run descriptors) as a COLUMN between selects — the
  * [[graft.operators.Winnow]] staging discipline — so lambda bodies
  * touch only bound attributes and per-doc cost drops to O(L log L)
  * (the in-row analogue of a single-machine hash-map counter), plus
  * an O(L·D) membership probe for D distinct DUPLICATED n-grams
  * (D ≈ 0 for clean prose). For pathological multi-MB single
  * documents, [[graft.operators.SpanDedup]]'s positioned-gram shuffle
  * shape is the distributed alternative.
  *
  * Determinism contract: "most frequent n-gram" ties break by larger
  * character mass, then lexicographically smallest gram — pinned so the
  * DuckDB oracle (struct-sort replay) decides identically. Fractions
  * are over TOKEN character mass (separators excluded), which both
  * engines compute as `length(join(toks, ''))`.
  *
  * Capability extension beyond the reference (SURVEY.md §2.9 family;
  * the reference's Python ETL has no per-document quality surface).
  */
object RepetitionSignals {

  /** Fraction of lines that are repeats of an earlier line
    * (1 - distinct/total); 0 for empty docs. Direct-argument HOFs only
    * — safe as a bare Column formula.
    */
  def dupLineFrac(lines: Column): Column =
    when(size(lines) <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double") /
        size(lines).cast("double"))

  /** Word n-grams joined by single spaces. `toks` MUST be a bound
    * column attribute (per-element `element_at` on an inline
    * expression re-evaluates it).
    */
  def ngrams(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))

  /** Per-distinct-value run descriptors `(cnt, value)` from a SORTED
    * bound column — run starts are sorted-neighbor boundaries, counts
    * are boundary distances; O(L) element touches per row. `sorted`
    * MUST be a bound attribute (it is referenced from lambda bodies).
    */
  private def runsOfSorted(sorted: Column): Column = {
    // Spark `sequence(1, 0)` is DESCENDING (the Bpe.symbols trap)
    val idx = when(size(sorted) >= 1, sequence(lit(1), size(sorted)))
      .otherwise(slice(sequence(lit(1), lit(1)), 1, 0))
    val bpos = filter(idx, i =>
      (i === 1) || element_at(sorted, i) =!= element_at(sorted, i - 1))
    // Empty input ⇒ empty runs. Without the guard, bpos=[] against
    // bnext=[size+1] zip_with-pads to [struct(null,null)] — every current
    // caller happens to neutralize it, but the helper contract shouldn't
    // rely on that.
    val bnext = when(size(bpos) > 0,
      concat(slice(bpos, lit(2), greatest(size(bpos) - 1, lit(0))),
        array(size(sorted) + 1)))
      .otherwise(slice(array(size(sorted)), 1, 0))
    zip_with(bpos, bnext, (st, en) =>
      struct((en - st).as("cnt"), element_at(sorted, st).as("value")))
  }

  /** Winner struct `(neg_cnt, neg_chars, gram)` of the
    * most-frequent-n-gram contest from a runs column (ascending struct
    * sort ⇒ element 1 is max count, then max char mass, then
    * lexicographically smallest).
    */
  private def bestRun(runs: Column, n: Int): Column =
    element_at(
      array_sort(transform(runs, r => struct(
        (-r.getField("cnt")).as("neg_cnt"),
        (-(length(r.getField("value")) - (n - 1))).as("neg_chars"),
        r.getField("value").as("gram")))), 1)

  /** Gopher Table A1 repetition thresholds: the FIRST failing rule
    * name (rule order is part of the contract, the q_gopher_filter
    * convention) or 'keep'.
    */
  def repetitionVerdict(dupLineF: Column, dupLineCharF: Column,
                        top2: Column, top3: Column, top4: Column,
                        dup5: Column, dup10: Column): Column =
    when(dupLineF > 0.30, lit("dup_lines"))
      .when(dupLineCharF > 0.20, lit("dup_line_chars"))
      .when(top2 > 0.20, lit("top_2gram"))
      .when(top3 > 0.18, lit("top_3gram"))
      .when(top4 > 0.16, lit("top_4gram"))
      .when(dup5 > 0.15, lit("dup_5gram"))
      .when(dup10 > 0.10, lit("dup_10gram"))
      .otherwise(lit("keep"))

  /** Append the raw signal columns `rep_dup_line_frac,
    * rep_dup_line_char_frac, rep_top2_frac, rep_top3_frac,
    * rep_top4_frac, rep_dup5_frac, rep_dup10_frac` to `df`. `linesCol` and `toksCol`
    * must be array&lt;string&gt; columns (callers choose the line
    * split; token streams with no embedded spaces keep the char-mass
    * arithmetic cross-engine exact). Intermediates are bound as
    * multi-referenced columns so CollapseProject cannot inline them
    * into lambda bodies (see class doc), then dropped.
    */
  def withSignals(df: DataFrame, linesCol: String, toksCol: String): DataFrame = {
    val totalChars = length(array_join(col(toksCol), ""))
    def topFrac(best: Column, n: Int) =
      when(size(col(toksCol)) < n || totalChars <= 0, lit(0.0)).otherwise(
        (-best.getField("neg_cnt") * -best.getField("neg_chars"))
          .cast("double") / totalChars.cast("double"))
    val lineChars =
      aggregate(col(linesCol), lit(0L), (acc, l) => acc + length(l))
    val dupLineChars = aggregate(
      filter(col("_rl"), r => r.getField("cnt") >= 2),
      lit(0L), (acc, r) => acc +
        r.getField("cnt").cast("long") * length(r.getField("value")))
    def dupFrac(n: Int) = {
      val dupStarts = filter(sequence(lit(1), size(col(toksCol)) - (n - 1)),
        p => array_contains(col(s"_dup$n"), element_at(col(s"_g$n"), p)))
      val coveredMass = aggregate(
        array_distinct(flatten(transform(dupStarts,
          p => sequence(p, p + (n - 1))))),
        lit(0L), (acc, i) => acc + length(element_at(col(toksCol), i)))
      // size(_dupN) both guards the probe and pins the alias
      // multi-use (single-use aliases inline into the lambda)
      when(size(col(toksCol)) < n || totalChars <= 0 ||
          size(col(s"_dup$n")) === 0, lit(0.0))
        .otherwise(coveredMass.cast("double") / totalChars.cast("double"))
    }
    // docs shorter than n: sequence(1, ≤0) is DESCENDING and would
    // probe element_at(toks, 0) — empty gram array instead
    def ngramsSafe(n: Int) =
      when(size(col(toksCol)) >= n, ngrams(col(toksCol), n))
        .otherwise(array().cast("array<string>"))
    df
      .withColumn("_slines", array_sort(col(linesCol)))
      .withColumn("_g5", ngramsSafe(5))
      .withColumn("_g10", ngramsSafe(10))
      .withColumn("_s2", array_sort(ngramsSafe(2)))
      .withColumn("_s3", array_sort(ngramsSafe(3)))
      .withColumn("_s4", array_sort(ngramsSafe(4)))
      .withColumn("_s5", array_sort(col("_g5")))
      .withColumn("_s10", array_sort(col("_g10")))
      .withColumn("_rl", runsOfSorted(col("_slines")))
      .withColumn("_r5", runsOfSorted(col("_s5")))
      .withColumn("_r10", runsOfSorted(col("_s10")))
      .withColumn("_b2", bestRun(runsOfSorted(col("_s2")), 2))
      .withColumn("_b3", bestRun(runsOfSorted(col("_s3")), 3))
      .withColumn("_b4", bestRun(runsOfSorted(col("_s4")), 4))
      .withColumn("_dup5", transform(
        filter(col("_r5"), r => r.getField("cnt") >= 2),
        r => r.getField("value")))
      .withColumn("_dup10", transform(
        filter(col("_r10"), r => r.getField("cnt") >= 2),
        r => r.getField("value")))
      .withColumn("rep_dup_line_frac", dupLineFrac(col(linesCol)))
      .withColumn("rep_dup_line_char_frac",
        when(lineChars <= 0, lit(0.0))
          .otherwise(dupLineChars.cast("double") / lineChars.cast("double")))
      .withColumn("rep_top2_frac", topFrac(col("_b2"), 2))
      .withColumn("rep_top3_frac", topFrac(col("_b3"), 3))
      .withColumn("rep_top4_frac", topFrac(col("_b4"), 4))
      .withColumn("rep_dup5_frac", dupFrac(5))
      .withColumn("rep_dup10_frac", dupFrac(10))
      .drop("_slines", "_g5", "_g10", "_s2", "_s3", "_s4", "_s5", "_s10",
        "_rl", "_r5", "_r10", "_b2", "_b3", "_b4", "_dup5", "_dup10")
  }
}
