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
    *    logp = ln((usage+α)/(total+α·|V|)) (M — `alpha` is add-α
    *    smoothing, 0 = the historical unsmoothed estimate), prune to
    *    vocabSize by (usage desc, piece asc) keeping single codepoints
    *    unprunable.
    *
    * `lossPrune = true` switches step 2's pruning to the SentencePiece
    * shape (Kudo 2018 §3.2): EM refines the FULL current vocab, then
    * each outer iteration removes the multi-codepoint pieces whose
    * removal costs the least total corpus log-likelihood — for each
    * candidate piece, re-Viterbi the words whose current best
    * segmentation uses it with the piece withheld, and charge the
    * frequency-weighted score drop. The vocab shrinks by at most
    * `1 - shrinkFactor` per iteration (never below vocabSize), so a
    * high-loss piece can survive several rounds of re-estimation that
    * usage-rank pruning would have cut on round one. EM here is
    * hard-EM (Viterbi counts, not forward-backward expectations) —
    * the same E-step both modes share; ties stay (loss desc, piece
    * asc) so training is replayable cross-engine.
    *
    * Returns (piece, logp) sorted by piece — the stored artifact shape.
    */
  def trainLocal(wordFreqs: Seq[(String, Long)], vocabSize: Int,
                 rounds: Int = 2, maxPieceLen: Int = 8,
                 seedFactor: Int = 4, alpha: Double = 0.0,
                 lossPrune: Boolean = false,
                 shrinkFactor: Double = 0.75): Seq[(String, Double)] = {
    require(vocabSize >= 1 && rounds >= 1 && maxPieceLen >= 1)
    require(alpha >= 0.0, "alpha is add-α smoothing mass, must be >= 0")
    require(shrinkFactor > 0.0 && shrinkFactor < 1.0,
      "shrinkFactor must be in (0,1): the per-iteration keep fraction")
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
    // shared E-step: frequency-weighted piece usage under current scores,
    // single codepoints floored to 1 (unprunable — coverage guarantee)
    def emUsage(): scala.collection.mutable.HashMap[String, Long] = {
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      wordFreqs.foreach { case (w, f) =>
        viterbiLocal(w, scores, maxPieceLen).foreach { p =>
          usage.update(p, usage.getOrElse(p, 0L) + f)
        }
      }
      chars.foreach(c => usage.update(c, math.max(usage.getOrElse(c, 0L), 1L)))
      usage
    }
    // shared M-step: add-α rescore over a usage-count vocab
    def rescore(vocab: Map[String, Long]): Map[String, Double] = {
      val total = vocab.values.sum.toDouble + alpha * vocab.size
      vocab.map { case (p, c) => p -> math.log((c + alpha) / total) }
    }
    val targetMulti = math.max(0, vocabSize - chars.size)
    if (!lossPrune) {
      (1 to rounds).foreach { _ =>
        val usage = emUsage()
        // usage-rank pruning: top multi-codepoint pieces by (usage desc,
        // piece asc); zero-usage pieces are absent from the map already
        val kept = usage.toSeq.sortBy { case (p, c) => (-c, p) }
        val multi = kept.filterNot(k => chars.contains(k._1)).take(targetMulti)
        scores = rescore((multi ++ kept.filter(k => chars.contains(k._1))).toMap)
      }
    } else {
      var done = false
      while (!done) {
        // EM refines the FULL current vocab: zero-usage multi-codepoint
        // pieces are retained through the M-step (with add-α mass when
        // α > 0, else at a finite floor half a nat below the worst used
        // piece), so the ONLY pruning is the shrinkFactor-bounded loss
        // pass below. Dropping them here would bypass the documented
        // per-iteration shrink bound in one silent step.
        (1 to rounds).foreach { _ =>
          val u = emUsage()
          val full: Map[String, Long] =
            scores.keys.map(p => p -> u.getOrElse(p, 0L)).toMap
          scores =
            if (alpha > 0.0) rescore(full)
            else {
              val rescored = rescore(full.filter(_._2 > 0L))
              val floor = rescored.values.min + math.log(0.5)
              full.map { case (p, c) =>
                p -> (if (c > 0L) rescored(p) else floor) }
            }
        }
        val multi = scores.keys.filterNot(chars.contains).toSeq
        if (multi.size <= targetMulti) done = true
        else {
          // best segmentation + score per word under the CURRENT vocab,
          // and the piece → affected-words index the loss pass probes
          val segs = wordFreqs.map { case (w, f) =>
            val seg = viterbiLocal(w, scores, maxPieceLen)
            (w, f, seg, seg.map(p => scores.getOrElse(p, -100.0)).sum)
          }
          val affected = scala.collection.mutable.HashMap
            .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
          segs.zipWithIndex.foreach { case ((_, _, seg, _), i) =>
            seg.distinct.foreach(p =>
              affected.getOrElseUpdate(p, scala.collection.mutable.ArrayBuffer.empty) += i)
          }
          // loss(p) = Σ_w f(w)·(score_with − score_without_p) over words
          // whose best segmentation uses p; words that don't use p lose 0
          val losses = multi.map { p =>
            val without = scores - p
            val l = affected.getOrElse(p, scala.collection.mutable.ArrayBuffer.empty)
              .iterator.map { i =>
                val (w, f, _, sc) = segs(i)
                f * (sc - viterbiScore(w, without, maxPieceLen))
              }.sum
            p -> l
          }
          // ceil(n·f) = n for small n — clamp to n-1 so every iteration
          // removes at least one piece (guaranteed termination)
          val keep = math.max(targetMulti, math.min(multi.size - 1,
            math.ceil(multi.size * shrinkFactor).toInt))
          val keptMulti = losses.sortBy { case (p, l) => (-l, p) }
            .take(keep).map(_._1).toSet
          scores = scores.filter { case (p, _) =>
            chars.contains(p) || keptMulti.contains(p) }
        }
      }
    }
    scores.toSeq.sortBy(_._1)
  }

  /** Distributed front half + driver EM: ONE corpus pass to the
    * word-frequency table (map-side partial agg), loud `maxWords` cap
    * on the collect, then [[trainLocal]].
    */
  def trainFast(docs: DataFrame, toksCol: String, vocabSize: Int,
                rounds: Int = 2, maxPieceLen: Int = 8,
                minFreq: Long = 1L, maxWords: Int = 2000000,
                alpha: Double = 0.0, lossPrune: Boolean = false,
                shrinkFactor: Double = 0.75): Seq[(String, Double)] = {
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
      vocabSize, rounds, maxPieceLen, alpha = alpha,
      lossPrune = lossPrune, shrinkFactor = shrinkFactor)
  }
}
