package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark-first DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (SURVEY.md §5.2): every query is totally ordered
  * on its projected columns (or a unique key prefix) before any LIMIT;
  * aggregates over doubles are rounded so parallel (Spark) vs sequential
  * (DuckDB) summation order cannot flip a hash compare; no
  * `current_date()` — as-of dates are literals.
  *
  * @param headline included in the per-round Bench run when true.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QuerySuite {
  def queries: Seq[GraftQuery]
}

/** Scratch base for the gates' stored-state fixtures (saved indexes,
  * staged sets, signature stores). USER-SCOPED: `java.io.tmpdir` is
  * host-shared, and two accounts running the suite on one CI host
  * would otherwise stage/overwrite each other's stores mid-read
  * (ADVICE r15 — the stamp checks self-heal sequential staleness, not
  * concurrent cross-user writes). Same-user concurrent JVMs remain the
  * caller's contract; the driver's protocol is serial.
  */
object GateStates {
  lazy val dir: String = {
    val user = Option(System.getProperty("user.name")).getOrElse("nouser")
      .replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_states_$user"
  }
}
