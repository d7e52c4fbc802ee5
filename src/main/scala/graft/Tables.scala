package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * scale-factor dir the driver passes in. Kept as a thin, lazy scan so
  * Catalyst sees the parquet relation directly (predicate pushdown /
  * column pruning reach the scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalization, tolerant of the physical type drifting
    * across testdata generations:
    *  - INT64 TIMESTAMP(NANOS) → admitted only as long (nanosAsLong);
    *    normalize to micros with *integer* division — epoch nanos
    *    (~1.7e18) exceed 2^53, so a double-typed `/` would lose precision.
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false micros) → cast to session-TZ
    *    TimestampType. Sessions pin UTC, so the wall-clock instant is
    *    unchanged; LTZ is required by event-time watermarks downstream.
    */
  private[graft] def withEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = withEventTime(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Deterministic CLUSTERED embedding variant of the `embeddings`
    * table — the corpus shape real (trained) embedding models produce,
    * which the raw synthetic table lacks (it is near-isotropic: pairwise
    * cosines concentrate, no inter-dimension correlation — the
    * information-free floor for every ANN recall number, per the
    * BASELINE round-12 curve notes). Derived ONLY from the driver's
    * parquet, fully relational, same (vec_id, embedding) contract:
    *
    *  - `nClusters` cluster centers = the raw vectors at
    *    vec_id < nClusters (ids < nClusters stay EXACT centers, so the
    *    seed-cell convention of [[graft.operators.Similarity.ivfAssign]]
    *    sees true centroids);
    *  - every other row i = center(i mod nClusters)
    *    + spread·t1(i)·u + spread·t2(i)·w, with integer coefficients
    *    t1 = (i mod 7) − 3, t2 = (⌊i/7⌋ mod 5) − 2 — a RANK-2
    *    within-cluster variance (the PqSpec micro-fixture construction
    *    promoted to corpus scale);
    *  - the two direction vectors u, w (raw rows nClusters,
    *    nClusters+1) are HEAD-MASKED: their last dim/2 coordinates are
    *    zeroed, so within-cluster variation is fully visible to every
    *    ≥ dim/2 prefix and partially to shorter ones — the
    *    coordinate-importance ordering Matryoshka-trained embedders
    *    produce (leading dims carry both cluster identity and
    *    refinement). The first cut of this fixture TAIL-masked the
    *    directions instead, which made within-cluster order invisible
    *    to every prefix — measured: MRL trunc recall FLAT at 0.07 for
    *    widths 4–32, the anti-Matryoshka — so one fixture serves both
    *    the residual-PQ regime (tiny ‖r‖², direction placement
    *    irrelevant) and the MRL prefix regime only with the head mask.
    */
  def clusteredEmbeddings(s: SparkSession, d: String,
                          nClusters: Int = 8,
                          spread: Double = 0.02): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = base.select(size(col("v"))).head().getInt(0)
    // the real dependency is on CORPUS ROWS, not the vector dimension:
    // centers are rows vec_id < nClusters and the two direction vectors
    // are rows nClusters / nClusters+1 — an undersized corpus would
    // otherwise pass a dim-based check and silently emit an EMPTY frame
    // through the empty broadcast direction joins
    require(nClusters >= 1,
      s"clusteredEmbeddings: need nClusters >= 1, got $nClusters")
    val nSeed = base.filter(col("vec_id") >= 0 &&
      col("vec_id") < nClusters + 2).count()
    require(nSeed == nClusters + 2L,
      s"clusteredEmbeddings: corpus must contain rows vec_id 0..${
        nClusters + 1} (centers + 2 direction vectors); found $nSeed of ${
        nClusters + 2}")
    val centers = base.filter(col("vec_id") < nClusters)
      .select((col("vec_id") % nClusters).as("cid"), col("v").as("cv"))
    def maskedDir(id: Int, name: String) =
      base.filter(col("vec_id") === id)
        .select(transform(col("v"), (x, i) =>
          when(i >= lit(dim / 2), lit(0.0)).otherwise(x)).as(name))
    base.select(col("vec_id"), (col("vec_id") % nClusters).as("cid"),
        when(col("vec_id") < nClusters, lit(0.0))
          .otherwise((col("vec_id") % 7 - 3).cast("double")).as("t1"),
        when(col("vec_id") < nClusters, lit(0.0))
          .otherwise((floor(col("vec_id") / 7) % 5 - 2).cast("double"))
          .as("t2"))
      .join(broadcast(centers), Seq("cid"))
      .crossJoin(broadcast(maskedDir(nClusters, "uv")))
      .crossJoin(broadcast(maskedDir(nClusters + 1, "wv")))
      .select(col("vec_id"),
        zip_with(
          zip_with(col("cv"), col("uv"),
            (c, uu) => c + col("t1") * lit(spread) * uu),
          col("wv"), (cu, ww) => cu + col("t2") * lit(spread) * ww)
          .as("embedding"))
  }

  /** Deterministic FULL-RANK anisotropic embedding fixture — the
    * corpus shape where a learned OPQ rotation has something to win,
    * which [[clusteredEmbeddings]] cannot provide (VERDICT r14 #4: its
    * rank-2 integer coefficients give 35 distinct within-cluster
    * positions, so ADC recall reads 0.05–0.19 at EVERY rotation — tie
    * groups hundreds deep make the gate rotation-blind). Derived only
    * from the driver's parquet, same (vec_id, embedding) contract:
    *
    *  - centers: the raw vectors at vec_id < nClusters (exact, the
    *    seed-cell convention);
    *  - within-cluster displacement: Σ_{r<dirs} t_r(i)·spread·u_r, the
    *    u_r = raw rows [nClusters, nClusters+dirs) — DENSE directions
    *    spread across every PQ subspace (raw synthetic rows are
    *    near-isotropic), which is exactly the inter-subspace
    *    correlation a rotation exists to remove. Integer coefficients
    *    t_r(i) = (⌊i/p_r⌋ mod 5) − 2 over pairwise-coprime strides
    *    p = 1, 5, 7, 11, 13, 17 give 5^dirs distinct positions per
    *    cluster;
    *  - a FULL-RANK tie-breaking jitter: ± eps·hash(i, dim)/1000 per
    *    coordinate (xxhash64 — deterministic, replayable), so no two
    *    vectors are identical and exact top-k has no deep tie groups.
    */
  def anisotropicEmbeddings(s: SparkSession, d: String,
                            nClusters: Int = 8, dirs: Int = 6,
                            spread: Double = 0.02,
                            eps: Double = 5e-4): DataFrame = {
    import org.apache.spark.sql.functions._
    require(nClusters >= 1 && dirs >= 1,
      s"anisotropicEmbeddings: need nClusters/dirs >= 1, got " +
      s"$nClusters/$dirs")
    val strides = Seq(1L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
    require(dirs <= strides.length,
      s"anisotropicEmbeddings: at most ${strides.length} directions")
    val base = embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // rows-not-dim dependency check (the clusteredEmbeddings lesson):
    // centers + direction vectors must exist or the broadcast joins
    // silently emit an empty frame
    val nSeed = base.filter(col("vec_id") >= 0 &&
      col("vec_id") < nClusters + dirs).count()
    require(nSeed == nClusters + dirs.toLong,
      s"anisotropicEmbeddings: corpus must contain rows vec_id 0..${
        nClusters + dirs - 1} (centers + direction vectors); found " +
      s"$nSeed of ${nClusters + dirs}")
    val centers = base.filter(col("vec_id") < nClusters)
      .select((col("vec_id") % nClusters).as("cid"), col("v").as("cv"))
    def dirCol(r: Int) = base.filter(col("vec_id") === (nClusters + r))
      .select(col("v").as(s"u$r"))
    def t(r: Int) = when(col("vec_id") < nClusters, lit(0.0))
      .otherwise((floor(col("vec_id") / strides(r)) % 5 - 2).cast("double"))
    val withDirs = (0 until dirs).foldLeft(
      base.select(col("vec_id"), (col("vec_id") % nClusters).as("cid"))
        .join(broadcast(centers), Seq("cid"))) {
      (df, r) => df.crossJoin(broadcast(dirCol(r)))
    }
    val displaced = (0 until dirs).foldLeft(col("cv")) { (acc, r) =>
      zip_with(acc, col(s"u$r"), (x, u) => x + t(r) * lit(spread) * u)
    }
    // centers stay EXACT (no jitter at vec_id < nClusters — the seed
    // convention); every other row gets the full-rank tie-breaker
    val jittered = transform(displaced, (x, i) =>
      x + when(col("vec_id") < nClusters, lit(0.0)).otherwise(
        lit(eps) * (pmod(xxhash64(col("vec_id"), i), lit(2001L)) - 1000L)
          .cast("double") / 1000.0))
    withDirs.select(col("vec_id"), jittered.as("embedding"))
  }

  /** Deterministic SPECTRAL embedding fixture — the canonical
    * OPQ-gain shape (Ge et al. 2013 §5's "unbalanced variance" regime):
    * a latent vector with strongly DECAYING per-coordinate variance,
    * observed through a fixed orthogonal MIXER that spreads the
    * high-variance latent directions across every PQ subspace. Raw PQ
    * must quantize correlated, mixed-scale marginals in each subspace;
    * a learned rotation can invert the mixer, concentrate the variance
    * back into few coordinates, and spend the (m, ksub) budget where
    * the signal lives — the gap a rotation-sensitive gate measures.
    *
    *  - latent z_i[d] = v_i[d] · rho^d over the raw (near-isotropic)
    *    synthetic rows — independent-ish coordinates, geometric decay;
    *  - observed x_i = R0 · z_i with R0 = (G·P)^layers: G the fixed
    *    Pythagorean Givens layer, P the stride-37 coordinate
    *    permutation (coprime to 64, so it is a permutation) — each
    *    layer doubles the nonzeros per row and the stride jumps across
    *    subspace boundaries, so after 3 layers every observed
    *    coordinate mixes ≥ 8 far-apart latent coordinates.
    *
    * Fully deterministic and derived only from the driver's parquet;
    * rotations preserve inner products, so exact cosine rankings are
    * the latent rankings.
    */
  def spectralEmbeddings(s: SparkSession, d: String, rho: Double = 0.9,
                         layers: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = base.select(size(col("v"))).head().getInt(0)
    val z = base.select(col("vec_id"),
      transform(col("v"), (x, i) =>
        x * pow(lit(rho), i.cast("double"))).as("z"))
    graft.operators.Opq.rotateVectors(z, "z", mixerRotation(dim, layers),
        "embedding")
      .select(col("vec_id"), col("embedding"))
  }

  /** (G·P)^layers — a fixed orthogonal mixer: Givens layer composed
    * with the stride-37 permutation, driver-side d×d doubles.
    */
  private[graft] def mixerRotation(dim: Int,
                                   layers: Int): Seq[Seq[Double]] = {
    require(dim % 2 == 0 && layers >= 1,
      s"mixerRotation: even dim and layers >= 1, got $dim/$layers")
    val g = graft.operators.Opq.givensRotation(dim)
      .map(_.toArray).toArray
    // P[i][j] = 1 iff j == (37·i) mod dim — a permutation when
    // gcd(37, dim) = 1 (it is for dim = 64)
    val p = Array.tabulate(dim, dim)((i, j) =>
      if (j == (37 * i) % dim) 1.0 else 0.0)
    val gp = graft.operators.Opq.matmul(g, p)
    var m = gp
    var l = 1
    while (l < layers) { m = graft.operators.Opq.matmul(gp, m); l += 1 }
    m.map(_.toSeq).toSeq
  }

  /** Register all tables as temp views so `spark.sql` entry points work
    * (the reference's fourth surface, SURVEY.md §3 "musemotion-queries.sql").
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
