package graft

/** Operational entry point for the staged-store GC (VERDICT r16 #6):
  * deletes stores under [[graft.queries.GateStates.dir]] not touched
  * within the retention window. Stagers touch their store on every
  * successful reuse, so age == time since last use; recipe changes
  * orphan the old hash dir, which ages out here. Deleting a live
  * store is safe — stores are caches and rebuild on next use.
  *
  * Usage: `PruneStates [maxAgeDays]` (default 7).
  */
object PruneStates {
  def main(args: Array[String]): Unit = {
    val days = if (args.nonEmpty) args(0).toDouble else 7.0
    val deleted = graft.queries.GateStates.prune(
      maxAgeMillis = (days * 24 * 60 * 60 * 1000).toLong)
    println(s"[prune-states] base ${graft.queries.GateStates.dir}, " +
      s"retention $days days, deleted ${deleted.size} store(s):")
    deleted.foreach(p => println(s"  $p"))
  }
}
