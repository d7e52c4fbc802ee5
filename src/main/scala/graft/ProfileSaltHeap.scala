package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SetSimJoin

/** Constrained-heap adjudication of the hot-bucket salting family
  * (VERDICT r16 #4, the r10 ProfileStreamState discipline applied to
  * SetSimJoin): run a planted-hot-token corpus — every doc shares one
  * prefix token, so ONE bucket holds the whole corpus — under a small
  * heap (launch this main with -Xmx4g) in three arms:
  *
  *  - `adaptive` (hotBucketSalt = -1, the default): the hot bucket
  *    splits into per-token salt cells sized from the engine's own
  *    counts; per-task candidate volume stays ≤ maxBucket², so the
  *    run completes inside the bounded heap.
  *  - `off` (hotBucketSalt = 0): the legacy tripwire — the guard
  *    aborts loudly at maxBucket before any quadratic work.
  *  - `unguarded` (hotBucketSalt = 0, maxBucket = corpus size): what
  *    the guard exists to prevent — the whole bucket lands on one
  *    task, whose candidate hash-dedup must materialize ~n²/2 pairs;
  *    at 4 GB this OOMs or crawls (run it under `timeout`).
  *
  * Fixture: n docs of 10 tokens — value-first hot token "aaa" +
  * unique "b<id>" + shared fillers — at threshold 0.85, so the
  * 2-token prefix is {aaa, b<id>} (ONE hot bucket = the whole
  * corpus) while NO pair passes verification (jaccard 9/11 ≈ 0.818 <
  * 0.85): the wall measures pure candidate machinery, not result
  * I/O. Prints wall, result rows, and the max per-task
  * peakExecutionMemory the run observed.
  *
  * Usage: `ProfileSaltHeap <adaptive|off|unguarded> [nDocs] [op]`
  * with op ∈ jaccard|containment (default jaccard). Dev-only; the
  * BASELINE.md table launches each arm as its own -Xmx4g JVM:
  *
  * {{{
  * java -Xmx4g -cp target/scala-2.13/classes:<sparkJarsGlob> \
  *   graft.ProfileSaltHeap adaptive 20000
  * }}}
  * where sparkJarsGlob is the /opt/spark/jars directory glob.
  */
object ProfileSaltHeap {
  def main(args: Array[String]): Unit = {
    val arm = args(0)
    val n = if (args.length > 1) args(1).toInt else 8000
    val op = if (args.length > 2) args(2) else "jaccard"
    // 8 threads per 4 GiB — a standard bounded-executor shape (a 32-
    // thread local JVM at 4 GiB gives each task a 16 MB fair share,
    // which models no real deployment); override with SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val peakTask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            peakTask.getAndAccumulate(m.peakExecutionMemory, math.max)
          ()
        }
      })

    // VALUE order decides prefixes: "aaa" sorts first (the planted hot
    // token, in EVERY doc's 2-slot prefix → one bucket = the corpus),
    // "b<id>" second (unique → singleton buckets), f-fillers never
    // reach a prefix. Shared tokens = aaa + f1..f8 = 9 of 11 → jaccard
    // 0.818 < 0.85 threshold, so candidate machinery runs in full but
    // the result is empty — wall and memory measure the hot bucket,
    // not result I/O.
    val fillers = (1 to 8).map(j => lit(s"f$j"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
      array(lit("aaa") +:
        concat(lit("b"), col("id").cast("string")) +:
        fillers: _*).as("toks"))

    // maxBucket sizes the per-task candidate bound (maxBucket² rows
    // through each task's join + partial-agg): 800² ≈ 640k candidates
    // per task keeps 8 concurrent tasks inside a 4 GiB heap, which is
    // exactly the knob a bounded-heap deployment turns. (First cut
    // used 2000 at 32 threads → 4M-entry per-task agg maps × 32
    // concurrent tasks OOMed the ADAPTIVE arm too — the bound must be
    // chosen for heap ÷ concurrency, and the instrument now
    // demonstrates the chosen bound holding.)
    val (maxBucket, salt) = arm match {
      case "adaptive"  => (800, -1)  // s = ⌈(n/800)²⌉ ≤ 1024 up to n=25.6k
      case "off"       => (800, 0)   // the loud tripwire at maxBucket
      case "unguarded" => (n + 1, 0) // admit the whole bucket unsalted
      case other => sys.error(s"unknown arm '$other'")
    }
    println(s"[salt-heap] arm=$arm op=$op n=$n maxBucket=$maxBucket " +
      s"hotBucketSalt=$salt heapMax=" +
      f"${Runtime.getRuntime.maxMemory / 1073741824.0}%.1f GiB")
    val t0 = System.nanoTime()
    try {
      val out = op match {
        case "jaccard" => SetSimJoin.jaccardPairs(docs, "doc_id", "toks",
          threshold = 0.85, maxBucket = maxBucket, hotBucketSalt = salt)
        case "containment" => SetSimJoin.containmentPairs(
          docs, "doc_id", "toks",
          threshold = 0.95, maxBucket = maxBucket, hotBucketSalt = salt)
        case other => sys.error(s"unknown op '$other'")
      }
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[salt-heap] COMPLETED in $sec%.1f s, $rows rows, " +
        f"peakTaskMem=${peakTask.get / 1048576.0}%.0f MB")
    } catch {
      case e: Throwable =>
        val sec = (System.nanoTime() - t0) / 1e9
        val root = {
          var c: Throwable = e
          while (c.getCause != null && c.getCause != c) c = c.getCause
          c
        }
        println(f"[salt-heap] RAISED after $sec%.1f s, " +
          f"peakTaskMem=${peakTask.get / 1048576.0}%.0f MB: " +
          s"${root.getClass.getSimpleName}: " +
          s"${Option(root.getMessage).getOrElse("").linesIterator
            .take(3).mkString(" / ").take(400)}")
    }
    spark.stop()
  }
}
