package graft.etl

/** Fuzzy header resolution — the dashboard's schema-drift shim
  * (/root/reference/streamlit_app.py:24-41,100-120) as a pure,
  * driver-side utility. Name normalization (lower/strip/spaces→_),
  * then exact match, then closest-edit-distance match above a
  * similarity cutoff; required columns hard-fail when unresolved.
  *
  * Driver-side by design: header lists are O(10) strings — this never
  * needs to be distributed (SURVEY.md §1.4).
  */
object SchemaResolver {

  /** streamlit_app.py:24-28 — lowercase, strip, spaces→underscores. */
  def normalize(name: String): String =
    name.trim.toLowerCase.replaceAll("\\s+", "_")

  /** Levenshtein distance (iterative two-row). */
  private[etl] def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = (0 to b.length).toArray
    val curr = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      curr(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(curr, 0, prev, 0, curr.length)
    }
    prev(b.length)
  }

  /** difflib-style similarity in [0,1] from edit distance. */
  private[etl] def similarity(a: String, b: String): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else 1.0 - levenshtein(a, b).toDouble / math.max(a.length, b.length)

  /** Map each expected column to the best-matching actual header:
    * exact normalized match first, else the most similar header above
    * `cutoff` (streamlit_app.py:100-107 uses difflib cutoff 0.6).
    */
  def resolve(
      expected: Seq[String],
      actual: Seq[String],
      cutoff: Double = 0.6): Map[String, Option[String]] = {
    val normActual = actual.map(a => normalize(a) -> a)
    expected.map { e =>
      val ne = normalize(e)
      val hit = normActual.find(_._1 == ne).map(_._2).orElse {
        val scored = normActual
          .map { case (na, raw) => (similarity(ne, na), raw) }
          .filter(_._1 >= cutoff)
        if (scored.isEmpty) None else Some(scored.maxBy(_._1)._2)
      }
      e -> hit
    }.toMap
  }

  /** Resolve with hard-required columns: unresolved required names raise
    * (streamlit_app.py:112-120's hard stop on city/model/make).
    */
  def resolveRequired(
      expected: Seq[String],
      actual: Seq[String],
      required: Set[String],
      cutoff: Double = 0.6): Map[String, String] = {
    val m = resolve(expected, actual, cutoff)
    val missing = required.filter(r => m.getOrElse(r, None).isEmpty)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"required columns unresolved: ${missing.toSeq.sorted.mkString(", ")} " +
        s"(headers seen: ${actual.mkString(", ")})")
    m.collect { case (k, Some(v)) => k -> v }
  }

  /** Header-row scorer for the Excel probe loop
    * (streamlit_app.py:30-41): +2 per exact normalized match, +1 per
    * fuzzy match ≥ 0.7.
    */
  def scoreHeader(candidate: Seq[String], expected: Seq[String]): Int = {
    val normCand = candidate.map(normalize)
    expected.map(normalize).map { e =>
      if (normCand.contains(e)) 2
      else if (normCand.exists(c => similarity(e, c) >= 0.7)) 1
      else 0
    }.sum
  }
}
