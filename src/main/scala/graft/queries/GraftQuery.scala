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

  /** Default retention for staged stores: a store untouched for this
    * long is an orphan. Recipe-hashed paths change whenever any
    * staging ingredient changes (tag, plant params, layout stamp,
    * data dir), so a superseded recipe's dir is never touched again
    * and ages past the horizon; live stores are re-touched on every
    * successful reuse ([[touch]]), so age == time since last use.
    */
  val DefaultRetentionMillis: Long = 7L * 24 * 60 * 60 * 1000

  /** Mark a staged store as just-used so [[prune]]'s age rule sees
    * live stores as fresh. Directory-mtime based: costs one metadata
    * write, needs no sidecar file, and a store adopted from a
    * concurrent winner is touched by its first reuse too.
    */
  def touch(path: String): Unit = {
    val ok = new java.io.File(path)
      .setLastModified(System.currentTimeMillis())
    if (!ok) {
      // setLastModified can fail (permissions, some network mounts);
      // silently ignoring it would let prune() GC a LIVE store a
      // concurrent reader is mid-scan on (ADVICE r17). Fallback: cycle
      // a `_`-prefixed sidecar entry — creating/deleting a directory
      // ENTRY bumps the dir mtime even where setting it directly is
      // refused, and Spark's parquet reader ignores `_` files.
      try {
        val side = java.nio.file.Paths.get(path, "_touch")
        java.nio.file.Files.deleteIfExists(side)
        java.nio.file.Files.write(side, Array.emptyByteArray)
        ()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[gate-states] touch($path) failed " +
          s"(setLastModified refused, sidecar write: $e) — the store " +
          "may age out under prune() while still live")
      }
    }
    ()
  }

  /** Age-based GC of the staged-store scratch (VERDICT r16 #6):
    * deletes direct children of [[dir]] not touched within
    * `maxAgeMillis` and returns the deleted paths. Orphans appear
    * whenever a staging recipe changes — the old recipe-hash dir
    * keeps its bytes but nothing ever reads it again. Deleting a
    * LIVE store is safe (it is a cache; the next gate rebuilds it),
    * so the rule errs loose rather than tracking liveness exactly.
    * In-flight `_build_` siblings race the GC only if a build outlasts
    * the retention horizon — at the documented 7-day default, orders
    * of magnitude past any staging build.
    */
  def prune(maxAgeMillis: Long = DefaultRetentionMillis,
            now: Long = System.currentTimeMillis()): Seq[String] = {
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(rmTree)
      f.delete(); ()
    }
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => now - f.lastModified() > maxAgeMillis)
      .map { f => rmTree(f); f.getAbsolutePath }
  }
}
