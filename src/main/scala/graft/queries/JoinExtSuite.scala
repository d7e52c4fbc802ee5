package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.GroupedTopK

/** Join-breadth extensions beyond the reference's inner/left/right/CTE
  * surface (SURVEY.md §2.4 "Not present: semi/anti … theta/range"):
  * left-semi, left-anti, per-group top-k, and a broadcast range (band)
  * join — each oracle-checked against the equivalent ANSI form.
  */
object JoinExtSuite extends QuerySuite {

  // ---- left-semi: customers with ≥1 urgent high-value order ----------
  // Semi joins shuffle only the distinct right-side keys (no row
  // multiplication, no right columns) — at scale the filter on orders
  // is pushed to its scan and the key set is a fraction of the table.
  private val semiJoin = GraftQuery(
    "q_semi_join",
    (s, d) => {
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
                col("o_totalprice") > 200000)
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy(asc("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
                AND o.o_totalprice > 200000)
            ORDER BY c_custkey"""))

  // ---- left-anti: customers with NO urgent order ---------------------
  private val antiJoin = GraftQuery(
    "q_anti_join",
    (s, d) => {
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(asc("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  // ---- per-group top-k (operators.GroupedTopK) -----------------------
  private val groupedTopK = GraftQuery(
    "q_grouped_topk",
    (s, d) =>
      GroupedTopK(orders(s, d), Seq("o_orderpriority"),
          Seq(desc("o_totalprice"), asc("o_orderkey")), k = 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
        .orderBy(asc("o_orderpriority"), asc("rank")),
    Some("""WITH ranked AS (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
              FROM orders)
            SELECT o_orderpriority, CAST(rank AS INTEGER) AS rank,
              o_orderkey, o_totalprice
            FROM ranked WHERE rank <= 3
            ORDER BY o_orderpriority, rank"""))

  // ---- broadcast range (band) join -----------------------------------
  // A tiny literal band dimension joined on a BETWEEN condition: the
  // band side broadcasts, so the non-equi predicate evaluates map-side
  // (BroadcastNestedLoopJoin over 4 rows), never a shuffled cross
  // product. For STATIC bands a CASE projection is equivalent; the join
  // form generalizes to band tables that arrive as data.
  private val rangeJoin = GraftQuery(
    "q_range_join",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val bands = Seq(
        ("b1_900_925", 900.0, 925.0),
        ("b2_925_950", 925.0, 950.0),
        ("b3_950_975", 950.0, 975.0),
        ("b4_975_1000", 975.0, 1000.0)).toDF("band", "lo", "hi")
      part(s, d)
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_parts"),
             round(avg("p_retailprice"), 2).as("avg_price"))
        .orderBy(asc("band"))
    },
    Some("""SELECT band, COUNT(*) AS n_parts,
              ROUND(AVG(p_retailprice), 2) AS avg_price
            FROM part
            JOIN (VALUES ('b1_900_925', 900.0, 925.0),
                         ('b2_925_950', 925.0, 950.0),
                         ('b3_950_975', 950.0, 975.0),
                         ('b4_975_1000', 975.0, 1000.0)) b(band, lo, hi)
              ON p_retailprice >= lo AND p_retailprice < hi
            GROUP BY band ORDER BY band"""))

  // ---- Bloom-pruned fact⋈dim join ------------------------------------
  // The fact side probes a broadcast Bloom filter of the (selective)
  // dim keys BEFORE the join shuffle — at 100 TB this cuts the shuffled
  // fact volume to ~the match rate instead of the whole table. Bloom
  // filters have no false negatives and the exact join removes false
  // positives, so the oracle is simply the plain join.
  private val bloomJoin = GraftQuery(
    "q_bloom_join",
    (s, d) => {
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.BloomJoin.prunedJoin(
          lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"),
                                col("l_discount")),
          urgent, "l_orderkey", "o_orderkey")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM").as("month"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
               .as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(asc("month"))
    },
    Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
              COUNT(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1 ORDER BY month"""))

  // ---- skew-salted join through the gate ------------------------------
  // Salting is result-invariant (each original pair appears exactly
  // once), so the oracle is the plain join aggregate. The gate pins
  // that invariance on real data; the unit spec pins pair-parity.
  private val saltedJoin = GraftQuery(
    "q_salted_join",
    (s, d) =>
      graft.operators.SaltedJoin.innerOnKey(
          lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
          orders(s, d).select(col("o_orderkey").as("l_orderkey"),
                              col("o_orderstatus")),
          key = "l_orderkey", saltFactor = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
             round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(asc("o_orderstatus")),
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  override val queries: Seq[GraftQuery] =
    Seq(semiJoin, antiJoin, groupedTopK, rangeJoin, bloomJoin, saltedJoin)
}
