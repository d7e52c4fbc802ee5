package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator suite. Each SURVEY.md §2
  * operator is a named entry in [[queries]]; SQL-expressible ones carry a
  * DuckDB oracle in [[oracleSql]] (the driver hash-compares results).
  */
object SparkEntry {

  /** All registered query suites, in build order. */
  def suites: Seq[QuerySuite] =
    Seq(RelationalSuite, EtlSuite, TextSuite, DedupSuite, SimilaritySuite,
        AdvancedSuite, AggExtSuite, CurationSuite, AnalyticsExtSuite,
        JoinExtSuite, BehaviorSuite, TextMiningSuite, ReshapeStatsSuite,
        WarehouseSuite, CorpusOpsSuite, StatsExtSuite, SourcesSuite,
        CurationExtSuite, SelectionSuite)

  private lazy val all: Seq[GraftQuery] = suites.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 3-way join + aggregation — exercises scan, broadcast join, shuffle
    * join, partial/final hash agg, and ordered output in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_segment_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Queries included in the Bench run. */
  def headlines: Seq[GraftQuery] = all.filter(_.headline)

  /** Collapse the triple-quoted indentation to single-line SQL so the
    * oracle JSON stays readable and newline-escape-free.
    */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
