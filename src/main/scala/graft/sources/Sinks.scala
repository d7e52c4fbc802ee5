package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink-side parity (SURVEY.md §2.1 S4/S5) plus the layouts that matter
  * at 100 TB.
  *
  * The reference's `to_sql(if_exists='replace'/'append', chunksize=N)`
  * maps onto Spark writer modes; its DDL-then-append dance
  * (/root/reference/load_local_to_db.py:122-150) is just mode semantics
  * here. Beyond parity: date-partitioned and bucketed layouts — the
  * difference between "a pile of files" and a layout where partition
  * pruning and co-located joins do the work of a cluster.
  */
object Sinks {

  /** S4 — snapshot replace (`if_exists='replace'`,
    * /root/reference/pipeline.py:163-170).
    */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S5 — append batch (`if_exists='append'`). */
  def appendBatch(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** CSV export mirroring the reference's flat-file interchange. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  /** S4/S5 over JDBC — the reference's actual RDBMS sink, with its
    * chunked-insert tuning (`chunksize=500`, fast_executemany →
    * `batchsize`; /root/reference/pipeline.py:61,169). Executed in tests
    * against embedded Derby (the only RDBMS in the container — ships
    * with Spark): overwrite, append, and the staged vin-upsert all
    * round-trip through a real database.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Overwrite,
                batchSize: Int = 500,
                properties: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(mode)
      .option("batchsize", batchSize)
      .jdbc(url, table, properties)

  /** Driver-side DDL/DML execution on the JDBC target — the reference's
    * `CREATE TABLE IF NOT EXISTS … PRIMARY KEY … UNIQUE` step before its
    * chunked append (/root/reference/load_musemotion_to_azure.py:96-142).
    * Spark's writer can create plain tables but never constraint-bearing
    * ones, so schema-with-constraints is issued here, once, from the
    * driver; the distributed writer then appends into it. Statements are
    * a driver-side O(1) action — nothing executor-side touches this.
    */
  def executeDdl(url: String, sql: String,
                 properties: java.util.Properties = new java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }

  /** JDBC read-back. Partitioned reads (one task per key range) are the
    * scale path for big tables: pass `partitionCol` + bounds to fan the
    * scan out over `numPartitions` concurrent connections.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               properties: java.util.Properties = new java.util.Properties,
               partitionCol: Option[String] = None,
               lower: Long = 0, upper: Long = 0,
               numPartitions: Int = 1): DataFrame =
    partitionCol match {
      case Some(c) =>
        spark.read.jdbc(url, table, c, lower, upper, numPartitions, properties)
      case None => spark.read.jdbc(url, table, properties)
    }

  /** Date-partitioned lake layout: `path/date_col=YYYY-MM-DD/part-*`.
    * At scale this is what makes time-range queries prune to a sliver
    * of the data (dynamic partition pruning reads only matching dirs).
    */
  def writePartitionedByDate(df: DataFrame, path: String,
                             dateCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .parquet(path)

  /** Bucketed table: pre-shuffled on the join key so repeated joins on
    * `bucketCol` need NO exchange (requires saveAsTable — bucket
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Schema-drift-tolerant multi-batch read: parquet footer-merge
    * (`mergeSchema`) gives union-by-name semantics AT THE SCAN — columns
    * a batch doesn't carry read as null, so older batches keep working
    * as the pipeline gains columns over time (the ingest reality at
    * 100 TB: you never rewrite shipped batches to add a field). One
    * relation, one scan; pushdown and pruning still apply per file.
    */
  def readMergedParquet(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** JSON-lines export/ingest — the interchange format for document
    * pipelines (one JSON object per line, splittable, schema-on-read).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC lake format (columnar alternative to parquet; same pushdown /
    * pruning behavior through the DSv2 scan).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Read back a partitioned/bucketed location. */
  def readLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
