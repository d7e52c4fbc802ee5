package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (the SentencePiece family, Kudo 2018) — the
  * OTHER trained-tokenizer lineage next to [[Bpe]]: instead of a merge
  * list applied bottom-up, a piece VOCABULARY with log-probabilities,
  * applied by Viterbi-segmenting each word into its maximum-likelihood
  * piece sequence.
  *
  * Training follows the [[Bpe.trainFast]] scale discipline exactly:
  * the ONE corpus-sized pass is the word-frequency aggregation
  * (explode + groupBy, map-side partials); candidate counting, EM
  * rounds, and pruning run on the driver over the |vocab|-bounded
  * word-freq table — the rare case where driver-side IS the scale-safe
  * shape, because the table is |distinct words|, not corpus rows, and
  * a distributed EM would pay a full corpus-join per round for a
  * KB-sized result. `maxWords` caps the collect LOUDLY (raise
  * `minFreq`; silent truncation would change the trained vocab).
  *
  * Determinism contract (both gates replay it): candidate seeding and
  * pruning order by (count desc, piece asc); Viterbi tie-breaks prefer
  * the LONGER last piece (accept-on-`>=` while scanning piece lengths
  * ascending); unknown single characters score `unkLogp` so every
  * word segments. All arithmetic is plain double — identical on
  * registration-time and engine-side runs of the same JVM code.
  */
object Unigram {

  /** Viterbi segmentation of one word over codepoint boundaries.
    * dp[i] = best log-prob of s[0,i); candidate last pieces are the
    * ≤ maxPieceLen-codepoint suffixes; multi-codepoint pieces must be
    * in-vocab, single codepoints fall back to `unkLogp` when unknown.
    */
  def viterbiLocal(word: String, vocab: Map[String, Double],
                   maxPieceLen: Int = 8,
                   unkLogp: Double = -100.0): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    // codepoint boundaries
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < word.length) {
      i += Character.charCount(word.codePointAt(i))
      bounds += i
    }
    val n = bounds.length - 1
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    dp(0) = 0.0
    var e = 1
    while (e <= n) {
      var l = 1
      while (l <= math.min(e, maxPieceLen)) {
        val s = e - l
        if (dp(s) != Double.NegativeInfinity) {
          val piece = word.substring(bounds(s), bounds(e))
          val lp = vocab.get(piece) match {
            case Some(p) => p
            case None => if (l == 1) unkLogp else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val score = dp(s) + lp
            // >= with l ascending ⇒ longest last piece wins ties
            if (score >= dp(e)) { dp(e) = score; back(e) = s }
          }
        }
        l += 1
      }
      e += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = n
    while (cur > 0) {
      val s = back(cur)
      out += word.substring(bounds(s), bounds(cur))
      cur = s
    }
    out.reverse.toSeq
  }

  /** Total Viterbi log-prob (same DP as [[viterbiLocal]], score only). */
  def viterbiScore(word: String, vocab: Map[String, Double],
                   maxPieceLen: Int = 8,
                   unkLogp: Double = -100.0): Double =
    viterbiLocal(word, vocab, maxPieceLen, unkLogp)
      .map(p => vocab.getOrElse(p,
        if (p.codePointCount(0, p.length) == 1) unkLogp
        else Double.NegativeInfinity)).sum

  /** Deterministic EM trainer over a word-frequency table.
    *
    * 1. Seed: every ≤ maxPieceLen-codepoint substring of every word,
    *    weighted by word frequency; keep the top seedFactor×vocabSize
    *    by (count desc, piece asc) PLUS all single codepoints.
    * 2. Each round: Viterbi-segment every word with the current
    *    scores, accumulate frequency-weighted piece usage (E), rescore
    *    logp = ln(usage/total) (M), prune to vocabSize by (usage desc,
    *    piece asc) keeping single codepoints unprunable.
    *
    * Returns (piece, logp) sorted by piece — the stored artifact shape.
    */
  def trainLocal(wordFreqs: Seq[(String, Long)], vocabSize: Int,
                 rounds: Int = 2, maxPieceLen: Int = 8,
                 seedFactor: Int = 4): Seq[(String, Double)] = {
    require(vocabSize >= 1 && rounds >= 1 && maxPieceLen >= 1)
    def codepoints(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out.toSeq
    }
    // substring candidate counts (positional occurrences × word freq)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    wordFreqs.foreach { case (w, f) =>
      val cps = codepoints(w)
      var s = 0
      while (s < cps.length) {
        var e = s + 1
        while (e <= math.min(cps.length, s + maxPieceLen)) {
          val piece = cps.slice(s, e).mkString
          counts.update(piece, counts.getOrElse(piece, 0L) + f)
          e += 1
        }
        s += 1
      }
    }
    val chars = wordFreqs.flatMap(w => codepoints(w._1)).toSet
    val seed = counts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(seedFactor * vocabSize).map(_._1).toSet ++ chars
    var scores: Map[String, Double] = {
      val total = seed.toSeq.map(counts.getOrElse(_, 1L)).sum.toDouble
      seed.map(p => p -> math.log(counts.getOrElse(p, 1L) / total)).toMap
    }
    (1 to rounds).foreach { _ =>
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      wordFreqs.foreach { case (w, f) =>
        viterbiLocal(w, scores, maxPieceLen).foreach { p =>
          usage.update(p, usage.getOrElse(p, 0L) + f)
        }
      }
      // single codepoints are unprunable (coverage guarantee)
      chars.foreach(c => usage.update(c, math.max(usage.getOrElse(c, 0L), 1L)))
      val kept = usage.toSeq
        .sortBy { case (p, c) => (-c, p) }
        .filter { case (p, _) =>
          chars.contains(p) || usage(p) > 0 }
      val multi = kept.filterNot(k => chars.contains(k._1))
        .take(math.max(0, vocabSize - chars.size))
      val vocab = (multi ++ kept.filter(k => chars.contains(k._1))).toMap
      val total = vocab.values.sum.toDouble
      scores = vocab.map { case (p, c) => p -> math.log(c / total) }
    }
    scores.toSeq.sortBy(_._1)
  }

  /** Distributed front half + driver EM: ONE corpus pass to the
    * word-frequency table (map-side partial agg), loud `maxWords` cap
    * on the collect, then [[trainLocal]].
    */
  def trainFast(docs: DataFrame, toksCol: String, vocabSize: Int,
                rounds: Int = 2, maxPieceLen: Int = 8,
                minFreq: Long = 1L, maxWords: Int = 2000000): Seq[(String, Double)] = {
    val rows = docs.select(explode(col(toksCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"Unigram.trainFast: more than $maxWords distinct words survive " +
      s"minFreq=$minFreq — raise minFreq; silently truncating the word " +
      "table would change the trained vocabulary")
    trainLocal(rows.map(r => (r.getString(0), r.getLong(1))).toSeq,
      vocabSize, rounds, maxPieceLen)
  }
}
