package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Retention rule for the staged-store scratch (VERDICT r16 #6): a
  * recipe change orphans the old recipe-hash dir forever (nothing
  * re-derives its path), so GC is age-since-last-use — stagers touch
  * their dir on every reuse, prune deletes dirs past the horizon.
  */
class GateStatesSpec extends AnyFunSuite {

  private def mkStore(name: String): java.io.File = {
    val d = new java.io.File(GateStates.dir,
      s"${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    assert(d.mkdirs())
    // nested content: prune must delete recursively like a real store
    val part = new java.io.File(d, "part-00000.parquet")
    java.nio.file.Files.write(part.toPath, "x".getBytes("UTF-8"))
    d
  }

  test("prune: a recipe-change orphan ages out; the live store remains") {
    val day = 24L * 60 * 60 * 1000
    val orphan = mkStore("gcspec_orphan") // the pre-change recipe hash
    val live = mkStore("gcspec_live")     // the current recipe hash
    try {
      assert(orphan.setLastModified(System.currentTimeMillis() - 8 * day))
      GateStates.touch(live.getAbsolutePath) // a gate just reused it
      val deleted = GateStates.prune()       // documented 7-day default
      assert(deleted.contains(orphan.getAbsolutePath),
        s"orphan not pruned; deleted=$deleted")
      assert(!orphan.exists(), "orphan dir survived the prune")
      assert(live.exists(), "live store was pruned")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(orphan); rm(live)
    }
  }

  test("touch refreshes age: an old-but-reused store survives the prune") {
    val day = 24L * 60 * 60 * 1000
    val store = mkStore("gcspec_reused")
    try {
      assert(store.setLastModified(System.currentTimeMillis() - 30 * day))
      GateStates.touch(store.getAbsolutePath) // reuse resets the clock
      val deleted = GateStates.prune()
      assert(!deleted.contains(store.getAbsolutePath) && store.exists(),
        "a just-touched store must never age out")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(store)
    }
  }
}
