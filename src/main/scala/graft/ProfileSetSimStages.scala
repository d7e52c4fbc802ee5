package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Stage-level drill-down for the set-similarity join's iteration
  * variance: runs jaccardPairs N times on the gate corpus and prints the
  * top stages by wall duration per iteration, to localize slow-iteration
  * stalls that query-level timing can't attribute.
  * Usage: `ProfileSetSimStages <sfDir> [reps] [queryName]` (default
  * q_setsim_join). Dev-only instrument.
  */
object ProfileSetSimStages {

  private class StageMeter extends org.apache.spark.scheduler.SparkListener {
    case class S(name: String, ms: Long, tasks: Int, shufWriteMB: Double,
                 gcMs: Long, cpuMs: Long, runMs: Long, where: String)
    val stages = TrieMap[Int, S]()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for {a <- i.submissionTime; b <- i.completionTime}
        yield b - a).getOrElse(-1L)
      val m = i.taskMetrics
      val where = i.details.linesIterator.toSeq.take(4)
        .mkString(" | ").take(200)
      stages.put(i.stageId, S(i.name.takeWhile(_ != '\n').take(60), wall,
        i.numTasks, m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.jvmGCTime, m.executorCpuTime / 1000000L, m.executorRunTime, where))
    }
    def reset(): Unit = stages.clear()
  }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("GRAFT_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new StageMeter
    spark.sparkContext.addSparkListener(meter)

    val qname = if (args.length > 2) args(2) else "q_setsim_join"
    val fn = SparkEntry.queries(qname)
    (1 to reps).foreach { i =>
      Thread.sleep(1500); meter.reset()
      val t0 = System.nanoTime()
      BenchAction.consumeAll(fn(spark, d))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"== it$i $sec%.2f s ==")
      meter.stages.toSeq.sortBy(-_._2.ms).take(8).foreach {
        case (id, s) =>
          println(f"  stage $id%4d ${s.ms}%7d ms tasks=${s.tasks}%3d " +
            f"shufW=${s.shufWriteMB}%7.1fMB gc=${s.gcMs}%5d cpu=${s.cpuMs}%7d " +
            f"run=${s.runMs}%7d  ${s.where}")
      }
    }
    spark.stop()
  }
}
