package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Hadoop-FS access helpers for driver-side probes and single-file
  * parsers. Everything goes through `FileSystem` resolved from the
  * path's own URI, so `hdfs://`, `s3a://`, `file:` and bare local paths
  * all work — a probe written against `java.nio` only works on the
  * driver's local disk, which is not where this engine's inputs live.
  */
object FsUtil {

  /** Open a file through the scheme-appropriate Hadoop FileSystem. */
  def open(path: String, conf: Configuration): InputStream = {
    val p = new Path(path)
    p.getFileSystem(conf).open(p)
  }

  /** First `n` text lines of a file — bounded read, closes the stream.
    * The probe cost is O(n lines), not O(file).
    */
  def headLines(path: String, n: Int, conf: Configuration): Seq[String] = {
    val in = open(path, conf)
    try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(br.readLine()).takeWhile(_ != null).take(n).toVector
    } finally in.close()
  }

  /** Expand a glob (or plain path) to concrete file paths, sorted for
    * deterministic partition order.
    */
  def expand(pattern: String, conf: Configuration): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap {
      case s if s.isDirectory =>
        fs.listStatus(s.getPath).toSeq.filter(_.isFile).map(_.getPath)
      case s => Seq(s.getPath)
    }
    files.map(_.toString).sorted
  }
}
