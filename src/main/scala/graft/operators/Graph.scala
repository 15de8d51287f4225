package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics: fixed-iteration PageRank over a weighted edge
  * table — the crawl-quality prior real pretraining pipelines attach to
  * web documents (host-level PageRank as a per-domain quality feature),
  * and, run over a word co-occurrence graph, the TextRank keyword
  * scorer (Mihalcea & Tarau 2004). One operator, two products.
  *
  * Determinism contract (the house fixed-point rule): ranks are
  * 6dp-rounded doubles after EVERY iteration, per-edge contributions
  * are 12dp-rounded then summed as DECIMAL(30,12) (order-independent
  * exact addition), and the dangling mass is an exact DECIMAL(18,6)
  * sum of the 6dp ranks — so the iteration map is a pure function of
  * the previous 6dp vector and the DuckDB oracle replays the identical
  * trajectory with k unrolled CTE stages. We compute the fixpoint OF
  * THE ROUNDED MAP, not a float approximation of the true one.
  *
  * 100 TB shape: the edge table is the big side (one edge per link);
  * it is normalized to per-edge shares ONCE, repartitioned by src, and
  * persisted — every iteration then shuffles only the rank vector
  * (O(nodes), typically 100-1000x smaller than edges) into that fixed
  * layout, joins, and aggregates by dst with map-side combine. Ranks
  * are eagerly localCheckpoint'ed each iteration so the plan never
  * accretes k joins of lineage (at cluster scale swap for a storage
  * checkpoint every few iterations — same truncation, executor-loss
  * safe). The per-iteration dangling-mass scalar crosses the wire as
  * one counter, never rows.
  */
object Graph {

  /** PageRank over `edges` (srcCol, dstCol [, weightCol]); returns
    * (node, rank) with `scale`-digit ranks after `iterations` rounds of
    * the damped update
    *   r'(v) = (1-d)/N + d*dm/N + d * Σ_{u->v} r(u) * w(u,v)/out(u)
    * where dm is the total rank parked on dangling (no-outlink) nodes,
    * redistributed uniformly — the standard teleport treatment, so the
    * vector stays a distribution (up to rounding residue).
    * Parallel edges collapse by summing weights; self-loops are legal
    * (they feed a node's own rank back). Weights must be positive.
    *
    * `scale` is the fixed-point grid of the dynamics and must sit WELL
    * below 1/N: ranks live near 1/N, so a grid within a couple of
    * orders of it quantizes them away (measured: 6dp over a 100k-node
    * graph leaked 6% of the mass). The default 12 is safe through
    * ~10^9 nodes; per-edge contribution terms round at scale+6.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 10,
      damping: Double = 0.85,
      scale: Int = 12,
      seedRanks: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    require(scale >= 1 && scale <= 18, s"scale in [1,18], got $scale")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    // Shares normalized once; the big table takes its one shuffle here
    // and every iteration reuses the cached src-partitioned layout.
    val outw = e.groupBy("src").agg(sum(col("w")).as("ow"))
    val ew = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct()
        // Dangling flag precomputed once: rank parked on these nodes
        // teleports uniformly each round.
        .join(e.select(col("src").as("node")).distinct()
          .withColumn("__has_out", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__has_out"), lit(false)).as("has_out"))
        .localCheckpoint(true)
      val n = nodes.count()
      require(n > 0, "empty graph")
      val cScale = scale + 6
      // Warm start: seed from a prior (node, rank) vector — the
      // incremental-graph path. Because each iteration is a pure
      // function of the previous scale-grid vector, continuing a cold
      // run's output for k more rounds is BIT-IDENTICAL to a cold
      // (iters+k) run (q_pagerank_warm proves it cross-engine); after
      // an edge delta, a few warm rounds re-converge without paying the
      // full cold schedule. Nodes unseen by the seed enter at 1/N.
      var ranks = (seedRanks match {
        case Some(sr) => nodes
          .join(sr.select(col("node"), col("rank").as("__seed")),
            Seq("node"), "left")
          .select(col("node"), col("has_out"),
            round(coalesce(col("__seed"), lit(1.0 / n)), scale).as("r"))
        case None => nodes.select(col("node"), col("has_out"),
          round(lit(1.0 / n), scale).as("r"))
      }).localCheckpoint(true)
      for (_ <- 1 to iterations) {
        // Exact decimal sum of the dangling ranks, riding the plan as a
        // broadcast one-row frame (a driver collect here would add a
        // whole job per iteration; the eager checkpoint below is the
        // only job each round pays).
        val dmDf = ranks.filter(!col("has_out"))
          .agg(coalesce(sum(col("r").cast(s"decimal(${scale + 6},$scale)"))
            .cast("double"), lit(0.0)).as("__dm"))
        // Per-edge terms rounded at scale+6, summed exactly: the
        // group-sum is order-independent, so Spark partitioning and the
        // SQL replay agree bit-for-bit; the quantization sits 6 orders
        // below the rank grid.
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(round(col("r") * col("share"), cScale)
            .cast(s"decimal(38,$cScale)")).cast("double").as("c"))
        ranks = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .crossJoin(broadcast(dmDf))
          .select(col("node"), col("has_out"),
            round(lit((1.0 - damping) / n)
              + lit(damping) * (col("__dm") / lit(n.toDouble))
              + lit(damping) * coalesce(col("c"), lit(0.0)), scale).as("r"))
          .localCheckpoint(true)
      }
      ranks.select(col("node"), col("r").as("rank"))
    } finally ew.unpersist(blocking = false)
  }

  /** Word co-occurrence edges for TextRank: consecutive token pairs of
    * each document (whitespace tokens — the house tokenizer), emitted
    * in BOTH directions so the graph is symmetric (TextRank is defined
    * on an undirected graph; a symmetric directed one is equivalent).
    * Edge weight = corpus-wide pair count. Vocabulary-bounded output:
    * at most |V|^2 rows no matter the corpus size.
    */
  def wordCooccurrenceEdges(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val pairs = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("a"),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("b"))).as("p"))
      .select(col("p.a").as("w1"), col("p.b").as("w2"))
    pairs.unionByName(pairs.select(col("w2").as("w1"), col("w1").as("w2")))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("w"))
  }

  /** TextRank keyword scores over a corpus: [[pageRank]] on the
    * [[wordCooccurrenceEdges]] graph. Returns every vocabulary word
    * with its 6dp rank — callers top-k it; the full table IS the
    * deterministic contract.
    */
  def textRank(
      docs: DataFrame,
      textCol: String,
      iterations: Int = 10,
      damping: Double = 0.85): DataFrame =
    pageRank(wordCooccurrenceEdges(docs, textCol), "w1", "w2", Some("w"),
      iterations, damping)
      .select(col("node").as("word"), col("rank"))

  /** PERSONALIZED PageRank (Haveliwala 2002): teleport lands on a seed
    * SET instead of uniformly —
    *   r'(v) = (1−d)·p(v) + d·dm·p(v) + d·Σ_{u→v} r(u)·share(u,v)
    * with p uniform over the seeds present in the graph and 0
    * elsewhere, r0 = p. Ranks measure proximity to the seeds through
    * the link structure — topic-sensitive crawl quality ("rank relative
    * to known-good hosts"), related-item scoring, trust propagation.
    * Kept as a SEPARATE method from [[pageRank]] so the three standing
    * global-PageRank contracts keep their expression trees (and hashes)
    * byte-stable.
    *
    * Same fixed-point contract and 100 TB shape as [[pageRank]]: edges
    * normalized/partitioned once, per-iteration state is the O(nodes)
    * vector, every sum an exact decimal fold, every vector re-grid'd at
    * `scale` per round; dangling mass teleports to the seeds (by p),
    * keeping the vector a distribution up to rounding residue. Seeds
    * not present in the graph are ignored (p normalizes over the
    * present ones); at least one seed must be present.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String = "node",
      weightCol: Option[String] = None,
      iterations: Int = 10,
      damping: Double = 0.85,
      scale: Int = 12): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    require(scale >= 1 && scale <= 18, s"scale in [1,18], got $scale")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("ow"))
    val ew = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedSet = seeds.select(col(seedCol).as("node")).distinct()
      val nodes0 = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct()
        .join(e.select(col("src").as("node")).distinct()
          .withColumn("__has_out", lit(true)), Seq("node"), "left")
        .join(seedSet.withColumn("__is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__has_out"), lit(false)).as("has_out"),
          coalesce(col("__is_seed"), lit(false)).as("is_seed"))
        .localCheckpoint(true)
      val nSeeds = nodes0.filter(col("is_seed")).count()
      require(nSeeds > 0, "no seed is present in the graph")
      val nodes = nodes0.select(col("node"), col("has_out"),
        when(col("is_seed"), round(lit(1.0 / nSeeds), scale))
          .otherwise(lit(0.0)).as("p"))
        .localCheckpoint(true)
      val cScale = scale + 6
      var ranks = nodes.select(col("node"), col("has_out"), col("p"),
        col("p").as("r")).localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val dmDf = ranks.filter(!col("has_out"))
          .agg(coalesce(sum(col("r").cast(s"decimal(${scale + 6},$scale)"))
            .cast("double"), lit(0.0)).as("__dm"))
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(round(col("r") * col("share"), cScale)
            .cast(s"decimal(38,$cScale)")).cast("double").as("c"))
        ranks = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .crossJoin(broadcast(dmDf))
          .select(col("node"), col("has_out"), col("p"),
            round(lit(1.0 - damping) * col("p")
              + lit(damping) * (col("__dm") * col("p"))
              + lit(damping) * coalesce(col("c"), lit(0.0)), scale).as("r"))
          .localCheckpoint(true)
      }
      ranks.select(col("node"), col("r").as("rank"))
    } finally ew.unpersist(blocking = false)
  }

  /** The DuckDB replay of [[personalizedPageRank]]: the same unrolled
    * MATERIALIZED-stage structure as [[pageRankOracleSql]], with the
    * teleport vector p (uniform over present seeds) replacing 1/N in
    * both the r0 seed and the per-stage update. `seedsCte` supplies a
    * one-column `node` seed list.
    */
  def personalizedPageRankOracleSql(
      edgesCte: String,
      seedsCte: String,
      iterations: Int,
      damping: Double,
      select: String,
      scale: Int = 12): String = {
    val d = damping
    val cScale = scale + 6
    val steps = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s"""dm$i AS MATERIALIZED (
         |  SELECT coalesce(CAST(sum(CAST(r AS DECIMAL(${scale + 6},$scale)))
         |                   AS DOUBLE), 0.0) AS dm
         |  FROM $p WHERE NOT has_out
         |), c$i AS MATERIALIZED (
         |  SELECT ew.dst AS node,
         |         CAST(sum(CAST(round(p.r * ew.share, $cScale)
         |                  AS DECIMAL(38,$cScale))) AS DOUBLE) AS c
         |  FROM ew JOIN $p p ON ew.src = p.node GROUP BY 1
         |), r$i AS MATERIALIZED (
         |  SELECT nodes.node, nodes.has_out, nodes.p,
         |         round((1.0 - $d) * nodes.p
         |               + $d * ((SELECT dm FROM dm$i) * nodes.p)
         |               + $d * coalesce(c.c, 0.0), $scale) AS r
         |  FROM nodes LEFT JOIN c$i c USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH edges_in AS MATERIALIZED ($edgesCte
       |), e AS MATERIALIZED (
       |  SELECT src, dst, CAST(sum(w) AS DOUBLE) AS w FROM edges_in GROUP BY 1, 2
       |), outw AS MATERIALIZED (
       |  SELECT src, sum(w) AS ow FROM e GROUP BY 1
       |), ew AS MATERIALIZED (
       |  SELECT e.src, e.dst, e.w / o.ow AS share FROM e JOIN outw o USING (src)
       |), seeds_in AS MATERIALIZED ($seedsCte
       |), nodes0 AS MATERIALIZED (
       |  SELECT node, bool_or(has_out) AS has_out FROM (
       |    SELECT src AS node, true AS has_out FROM e
       |    UNION ALL SELECT dst, false FROM e) GROUP BY 1
       |), ns AS MATERIALIZED (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_seeds
       |  FROM nodes0 WHERE node IN (SELECT node FROM seeds_in)
       |), nodes AS MATERIALIZED (
       |  SELECT node, has_out,
       |         CASE WHEN node IN (SELECT node FROM seeds_in)
       |              THEN round(1.0 / (SELECT n_seeds FROM ns), $scale)
       |              ELSE 0.0 END AS p
       |  FROM nodes0
       |), r0 AS MATERIALIZED (
       |  SELECT node, has_out, p, p AS r FROM nodes
       |), $steps
       |$select""".stripMargin
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a directed edge
    * table — the complementary crawl prior to [[pageRank]]: a good HUB
    * links to many good authorities (link farms and index pages score
    * here, not on PageRank), a good AUTHORITY is linked from many good
    * hubs. Fixed-iteration, L1-normalized variant on the house decimal
    * grid: per round,
    *   a'(v) = Σ_{u→v} h(u)   then a := round(a' / Σa', scale)
    *   h'(u) = Σ_{u→v} a(v)   then h := round(h' / Σh', scale)
    * Every Σ is an exact decimal fold of grid values (order-free), the
    * normalizing division is one scalar per node, and the vectors
    * re-enter the grid each half-step — so the trajectory is a pure
    * function of the previous grid vectors and the unrolled-CTE oracle
    * replays it bit for bit (same discipline as [[pageRank]]; L1
    * instead of the textbook L2 because Σ is exactly summable where
    * sqrt-of-sum-of-squares is not).
    *
    * 100 TB shape: identical to [[pageRank]] — edges shuffle once into
    * a persisted layout (parallel edges collapse), every iteration
    * moves only the two O(nodes) vectors against it, each checkpointed
    * so lineage stays flat. Nodes with no in-links hold authority 0,
    * no out-links hub 0; both stay in the output.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      scale: Int = 12): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(scale >= 1 && scale <= 18, s"scale in [1,18], got $scale")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct()
        .localCheckpoint(true)
      val n = nodes.count()
      require(n > 0, "empty graph")
      val dec = s"decimal(38,$scale)"
      // L1-normalize a raw vector column back onto the grid, LAZILY:
      // only the raw half-step vector is materialized (one job); the
      // normalize is a plan over its cached partitions, with the mass
      // total riding as a broadcast one-row frame (no driver collect),
      // exactly like pageRank's dangling mass. The next half-step's
      // checkpoint — and only it — evaluates this view, so each
      // half-step pays ONE job instead of the two the r14 shape paid
      // (checkpoint raw + checkpoint normalized): q_hits dropped from
      // ~10 to ~5 checkpointed jobs per 5-iteration run. Recompute-safe:
      // every consumer reads the CHECKPOINTED raw, so the broadcast
      // total is a tiny scan of cached partitions, never a re-join.
      def normalized(raw: DataFrame, c: String): DataFrame = {
        val r = raw.localCheckpoint(true)
        val tot = r.agg(
          sum(col(c).cast(dec)).cast("double").as("__tot"))
        r.crossJoin(broadcast(tot))
          .select(col("node"),
            round(col(c) / col("__tot"), scale).as(c))
      }
      var h = nodes.select(col("node"), round(lit(1.0 / n), scale).as("h"))
        .localCheckpoint(true)
      var a: DataFrame = null
      for (_ <- 1 to iterations) {
        val aRaw = nodes.join(
            e.join(h, col("src") === col("node")).drop("node")
              .groupBy(col("dst").as("node"))
              .agg(sum(col("h").cast(dec)).cast("double").as("__a")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("__a"), lit(0.0)).as("a"))
        a = normalized(aRaw, "a")
        val hRaw = nodes.join(
            e.join(a, col("dst") === col("node")).drop("node")
              .groupBy(col("src").as("node"))
              .agg(sum(col("a").cast(dec)).cast("double").as("__h")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("__h"), lit(0.0)).as("h"))
        h = normalized(hRaw, "h")
      }
      nodes.join(h, Seq("node")).join(a, Seq("node"))
        .select(col("node"), col("h").as("hub"), col("a").as("authority"))
    } finally e.unpersist(blocking = false)
  }

  /** The DuckDB replay of [[hits]]: unrolled half-step CTEs mirroring
    * the arithmetic literally (same decimal folds, same scalar
    * normalize-then-round), over an `edges_in(src, dst)` CTE the
    * caller supplies. MATERIALIZED for the same 3^k reason as
    * [[pageRankOracleSql]].
    */
  def hitsOracleSql(
      edgesCte: String,
      iterations: Int,
      select: String,
      scale: Int = 12): String = {
    val dec = s"DECIMAL(38,$scale)"
    val steps = (1 to iterations).map { i =>
      val ph = s"h${i - 1}"
      s"""araw$i AS MATERIALIZED (
         |  SELECT nodes.node,
         |         coalesce(x.a, 0.0) AS a
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(sum(CAST(p.h AS $dec)) AS DOUBLE) AS a
         |    FROM e JOIN $ph p ON e.src = p.node GROUP BY 1) x USING (node)
         |), a$i AS MATERIALIZED (
         |  SELECT node, round(a / (SELECT CAST(sum(CAST(a AS $dec)) AS DOUBLE)
         |                          FROM araw$i), $scale) AS a
         |  FROM araw$i
         |), hraw$i AS MATERIALIZED (
         |  SELECT nodes.node,
         |         coalesce(x.h, 0.0) AS h
         |  FROM nodes LEFT JOIN (
         |    SELECT e.src AS node,
         |           CAST(sum(CAST(p.a AS $dec)) AS DOUBLE) AS h
         |    FROM e JOIN a$i p ON e.dst = p.node GROUP BY 1) x USING (node)
         |), h$i AS MATERIALIZED (
         |  SELECT node, round(h / (SELECT CAST(sum(CAST(h AS $dec)) AS DOUBLE)
         |                          FROM hraw$i), $scale) AS h
         |  FROM hraw$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH edges_in AS MATERIALIZED ($edgesCte
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM edges_in
       |  WHERE src IS NOT NULL AND dst IS NOT NULL
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
       |), nn AS MATERIALIZED (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
       |), h0 AS MATERIALIZED (
       |  SELECT node, round(1.0 / (SELECT n FROM nn), $scale) AS h FROM nodes
       |), $steps
       |$select""".stripMargin
  }

  /** The DuckDB replay of [[pageRank]]: `iterations` unrolled CTE
    * stages over an `edges_in(src, dst, w)` CTE the caller supplies.
    * Emitted as SQL text (the oracle map is strings); every arithmetic
    * step mirrors the Spark expression tree literally — same literals,
    * same parenthesization, same rounding grid — so the trajectories
    * are IEEE-identical, not merely close.
    */
  def pageRankOracleSql(
      edgesCte: String,
      iterations: Int,
      damping: Double,
      select: String,
      scale: Int = 12): String = {
    // Every stage CTE is AS MATERIALIZED: each r{i} is referenced three
    // times by stage i+1 (dm, contribs, carry), so inlining would blow
    // up the expression tree 3^k-fold — materialization makes the
    // replay linear in k exactly like the engine's per-iteration
    // checkpoints.
    val d = damping
    val cScale = scale + 6
    val steps = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s"""dm$i AS MATERIALIZED (
         |  SELECT coalesce(CAST(sum(CAST(r AS DECIMAL(${scale + 6},$scale)))
         |                   AS DOUBLE), 0.0) AS dm
         |  FROM $p WHERE NOT has_out
         |), c$i AS MATERIALIZED (
         |  SELECT ew.dst AS node,
         |         CAST(sum(CAST(round(p.r * ew.share, $cScale)
         |                  AS DECIMAL(38,$cScale))) AS DOUBLE) AS c
         |  FROM ew JOIN $p p ON ew.src = p.node GROUP BY 1
         |), r$i AS MATERIALIZED (
         |  SELECT nodes.node, nodes.has_out,
         |         round((1.0 - $d) / (SELECT n FROM nn)
         |               + $d * ((SELECT dm FROM dm$i) / (SELECT n FROM nn))
         |               + $d * coalesce(c.c, 0.0), $scale) AS r
         |  FROM nodes LEFT JOIN c$i c USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH edges_in AS MATERIALIZED ($edgesCte
       |), e AS MATERIALIZED (
       |  SELECT src, dst, CAST(sum(w) AS DOUBLE) AS w FROM edges_in GROUP BY 1, 2
       |), outw AS MATERIALIZED (
       |  SELECT src, sum(w) AS ow FROM e GROUP BY 1
       |), ew AS MATERIALIZED (
       |  SELECT e.src, e.dst, e.w / o.ow AS share FROM e JOIN outw o USING (src)
       |), nodes AS MATERIALIZED (
       |  SELECT node, bool_or(has_out) AS has_out FROM (
       |    SELECT src AS node, true AS has_out FROM e
       |    UNION ALL SELECT dst, false FROM e) GROUP BY 1
       |), nn AS MATERIALIZED (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
       |), r0 AS MATERIALIZED (
       |  SELECT node, has_out, round(1.0 / (SELECT n FROM nn), $scale) AS r
       |  FROM nodes
       |), $steps
       |$select""".stripMargin
  }
}
