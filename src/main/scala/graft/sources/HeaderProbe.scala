package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SchemaResolver

/** S3 — header-row autodetection (SURVEY.md §2.1), the engine-side
  * rendition of the dashboard's Excel probe loop
  * (/root/reference/streamlit_app.py:43-77): probe the first
  * `maxProbe` rows as header candidates, score each against the
  * expected column names (+2 exact, +1 fuzzy — SchemaResolver's
  * scorer), then read the file with the winner as header.
  *
  * The probe reads only `maxProbe + 1` driver-side lines (the
  * reference's `nrows=0` metadata reads); the full scan happens once,
  * distributed, at the chosen offset. Excel itself needs an
  * out-of-engine conversion (no POI on the classpath) — the detection
  * algorithm is format-agnostic and operates on parsed rows.
  */
object HeaderProbe {

  final case class Detection(headerRow: Int, score: Int, headers: Seq[String])

  /** Score rows 0..maxProbe as header candidates. */
  def detect(rows: Seq[Seq[String]], expected: Seq[String],
             maxProbe: Int = 10): Option[Detection] = {
    val candidates = rows.take(maxProbe + 1).zipWithIndex.map {
      case (r, i) => Detection(i, SchemaResolver.scoreHeader(r, expected), r)
    }
    candidates.filter(_.score > 0) match {
      case Seq() => None
      case hits  => Some(hits.maxBy(_.score))
    }
  }

  /** Read a CSV whose header row position is unknown: probe, then scan
    * once skipping everything above the detected header.
    *
    * The probe opens the file through the scheme-appropriate Hadoop
    * FileSystem ([[FsUtil.headLines]]) and reads only the first
    * `maxProbe + 1` lines — works on `hdfs://`/`s3a://` paths where the
    * engine actually runs, not just the driver's local disk. The full
    * scan that follows is one extra distributed job (zipWithIndex to
    * skip pre-header lines by file order) — the price of an unknown
    * header offset, paid once at ingest.
    */
  def readCsvAutoHeader(spark: SparkSession, path: String,
                        expected: Seq[String],
                        maxProbe: Int = 10): DataFrame = {
    val probeLines = FsUtil
      .headLines(path, maxProbe + 1, spark.sparkContext.hadoopConfiguration)
      .map(_.split(",", -1).toSeq)
    val det = detect(probeLines, expected, maxProbe).getOrElse(
      throw new IllegalArgumentException(
        s"no header row found in first ${maxProbe + 1} rows of $path " +
        s"(expected like: ${expected.mkString(", ")})"))
    // skip pre-header rows + the header by *file line order*
    // (zipWithIndex preserves it; monotonically_increasing_id does not
    // across partitions), then parse the remaining lines as CSV with the
    // detected, normalized names imposed.
    import spark.implicits._
    val body = spark.createDataset(
      spark.read.textFile(path).rdd.zipWithIndex()
        .filter(_._2 > det.headerRow).map(_._1))
    val parsed = spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(body)
    val names = det.headers.map(SchemaResolver.normalize)
    val kept = parsed.columns.take(names.length)
    parsed.select(kept.zip(names).map {
      case (c, n) => org.apache.spark.sql.functions.col(c).as(n)
    }.toIndexedSeq: _*)
  }
}
