package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions
import graft.operators.GroupedTopK

/** Reshaping + distribution-statistics breadth: corpus n-gram
  * frequencies, deterministic per-group sampling, histogram binning,
  * unpivot (melt), and cross join — rounding out SURVEY.md §2.5–§2.7
  * beyond the reference's surface. All oracle-checked.
  */
object ReshapeStatsSuite extends QuerySuite {

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  // ---- corpus bigram frequency, top 50 -------------------------------
  // Tokens are materialized as a bound column BEFORE the bigram lambda
  // (interpreted HOFs re-evaluate nested arrays per element access —
  // see Dedup.shingleHashesFromTokenHashes). Docs with <2 tokens are
  // filtered (Spark's sequence(1,0) counts DOWN, unlike DuckDB's empty
  // generate_series).
  private val topBigrams = GraftQuery(
    "q_top_bigrams",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      t.select(explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
                              element_at(col("toks"), i + 1)))).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("bg"))
        .limit(50)
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents),
             bg AS (
               SELECT unnest(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS bg
               FROM t)
             SELECT bg, COUNT(*) AS n FROM bg
             GROUP BY bg ORDER BY n DESC, bg LIMIT 50"""))

  // ---- deterministic per-group "random" sample -----------------------
  // Reservoir-style k-per-group sampling made deterministic AND
  // cross-engine checkable: order within group by md5 of the key (an
  // unbiased, content-keyed shuffle both engines compute identically),
  // take the top k. Same WindowGroupLimit scale path as GroupedTopK.
  private val groupSample = GraftQuery(
    "q_group_sample",
    (s, d) =>
      GroupedTopK(documents(s, d), Seq("lang"),
          Seq(md5(col("doc_id").cast("string")).asc, asc("doc_id")), k = 3)
        .select("lang", "rank", "doc_id")
        .orderBy(asc("lang"), asc("rank")),
    Some("""WITH ranked AS (
              SELECT lang, doc_id,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
              FROM documents)
            SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id
            FROM ranked WHERE rank <= 3 ORDER BY lang, rank"""))

  // ---- histogram binning ---------------------------------------------
  private val histogram = GraftQuery(
    "q_histogram",
    (s, d) =>
      orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
             round(min("o_totalprice"), 2).as("lo"),
             round(max("o_totalprice"), 2).as("hi"))
        .orderBy(asc("bin")),
    Some("""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
              COUNT(*) AS n,
              ROUND(MIN(o_totalprice), 2) AS lo,
              ROUND(MAX(o_totalprice), 2) AS hi
            FROM orders GROUP BY bin ORDER BY bin"""))

  // ---- unpivot / melt ------------------------------------------------
  private val unpivotMetrics = GraftQuery(
    "q_unpivot",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount")),
          "metric", "val")
        // (l_orderkey, l_linenumber) is NOT unique in the testdata —
        // val joins the sort to make the order total
        .orderBy(asc("l_orderkey"), asc("l_linenumber"), asc("metric"),
                 asc("val")),
    Some("""SELECT l_orderkey, l_linenumber, metric, CAST(val AS DOUBLE) AS val
            FROM (
              UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount
                       FROM lineitem WHERE l_orderkey < 100)
              ON l_quantity, l_discount INTO NAME metric VALUE val)
            ORDER BY l_orderkey, l_linenumber, metric, val"""))

  // ---- cross join (tiny dims) ----------------------------------------
  private val crossJoinDims = GraftQuery(
    "q_cross_join",
    (s, d) =>
      nation(s, d).crossJoin(region(s, d))
        .select(col("n_name"), col("r_name"))
        .orderBy(asc("n_name"), asc("r_name")),
    Some("""SELECT n_name, r_name FROM nation CROSS JOIN region
            ORDER BY n_name, r_name"""))

  override val queries: Seq[GraftQuery] =
    Seq(topBigrams, groupSample, histogram, unpivotMetrics, crossJoinDims)
}
