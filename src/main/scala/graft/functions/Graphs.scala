package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge lists. Connected
  * components live in [[Dedup.dupClusters]] (pointer-halving label
  * propagation); this object holds the value-propagation side —
  * PageRank-style fixed-iteration power methods.
  *
  * Scale shape: each iteration is ONE join of the edge list against the
  * current rank frame (shuffle on the src key, partial-aggregated sum on
  * the dst key) — the textbook distributed PageRank dataflow. The rank
  * frame carries (node, rank) only; edges carry (src, dst, outdeg). No
  * driver-side state beyond the loop counter; the edge frame is
  * localCheckpointed ONCE so the per-iteration lineage stays flat
  * (without the barrier, iteration k replays the edge derivation k
  * times and the plan grows superlinearly).
  */
object Graphs {

  /** Fixed-iteration PageRank over a DANGLING-FREE edge list (every
    * node has outdegree >= 1 — symmetric/undirected edge lists satisfy
    * this by construction; callers with genuinely directed graphs add
    * self-loops or drop sink nodes first, else sink-absorbed mass
    * silently leaks and ranks no longer sum to 1).
    *
    * Determinism (the property that lets a float iteration face a
    * DuckDB oracle): per-edge contributions `rank / outdeg` are single
    * IEEE divisions (correctly rounded — bit-identical cross-engine);
    * the per-node sum runs in FIXED-POINT — `floor(contrib * 2^44)` as
    * a long (power-of-two scaling and floor are exact and unambiguous;
    * a decimal cast of a double is NOT: Spark rounds the shortest
    * string repr, DuckDB the exact binary expansion, and they disagree
    * in the last digit often enough to drift a large sum) — so
    * addition is exact and order-independent; the damping update is a
    * fixed dag of IEEE ops on the de-scaled sum. No libm, no
    * order-dependent float folds. Contributions are probabilities
    * (≤ 1), so a node's scaled in-mass stays below 2^44 ≪ 2^63 at any
    * in-degree, and below 2^53 for the exact double de-scale.
    *
    * Output: (node, rank) for every node appearing in the edge list.
    * Ranks sum to ~1 (exactly 1 minus decimal-cast rounding dust).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "need 1 <= iters <= 20")
    require(damping > 0 && damping < 1, "need 0 < damping < 1")
    // materialize the caller's edge pipeline ONCE: ed and nodes are two
    // separate checkpoint actions, and without this barrier each replays
    // the full upstream edge derivation (for the covisitation-graph
    // callers that upstream is a pair self-join — the most expensive
    // stage of the whole query, measured running twice). EAGER
    // deliberately: r15 measured the lazy variant (localCheckpoint(false))
    // at 1.14-1.16x WORSE — under AQE the stage-materialization jobs run
    // at toRdd time either way, so laziness saves no action and only
    // moves the final-stage compute into concurrently-blocked consumer
    // tasks; eager also keeps broadcast(nTot) building from materialized
    // blocks instead of racing spark.sql.broadcastTimeout at scale
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // the teleport constant is computed ONCE in driver-side IEEE double
    // arithmetic and shipped to both engines as a literal — 1.0 - 0.85
    // inside DuckDB would run in exact DECIMAL and land one ulp away
    val tele = 1.0 - damping
    val scale = math.pow(2, 44)
    val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nTot))
      .select(col("node"),
        (lit(1.0) / col("n_nodes").cast("double")).as("rank"),
        col("n_nodes"))
    for (_ <- 1 to iters) {
      ranks = ed
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("rank") / col("outdeg").cast("double") * lit(scale))
            .as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_mass"))
        .join(nodes, Seq("node"), "right")
        .crossJoin(broadcast(nTot))
        .select(col("node"),
          (lit(tele) / col("n_nodes").cast("double") +
            lit(damping) *
              (coalesce(col("in_mass").cast("double"), lit(0.0)) / lit(scale)))
            .as("rank"),
          col("n_nodes"))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** PERSONALIZED PageRank (topic-sensitive PageRank, Haveliwala 2002):
    * identical fixed-point power iteration to [[pageRank]], but the
    * teleport mass lands uniformly on the SEED set instead of all
    * nodes — the "related to THESE items" ranking a recommender builds
    * from a query/context set. Same dangling-free requirement, same
    * 2^44 fixed-point contribution sums, same driver-computed teleport
    * literal.
    *
    * `seeds` carries one column `node`; seeds absent from the edge
    * list are ignored (teleport normalizes over the seeds that exist).
    * Scale shape: identical to [[pageRank]] plus one broadcast-sized
    * seed join per iteration.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "need 1 <= iters <= 20")
    require(damping > 0 && damping < 1, "need 0 < damping < 1")
    // one edge-pipeline materialization, as in [[pageRank]]: ed and the
    // seed-marked node frame each checkpoint, and both would otherwise
    // replay the caller's edge self-join (eager for the same measured
    // reason as pageRank)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint()
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val nodes = nodes0
      .join(seeds.select(col("node")).distinct()
          .withColumn("__seed", lit(true)),
        Seq("node"), "left")
      .withColumn("__seed", coalesce(col("__seed"), lit(false)))
      .localCheckpoint()
    // n_seeds = 0 (empty seed frame, or seeds fully disjoint from the
    // edge list) would silently divide teleport and initial rank into
    // NaN/Infinity in BOTH engines — fail fast like the iters/damping
    // requires. The check is a limit-1 probe of the already-materialized
    // node checkpoint, not a data-sized action.
    require(!nodes.filter(col("__seed")).isEmpty,
      "personalizedPageRank: no seed node appears in the edge list " +
        "(teleport mass would divide by zero)")
    val tele = 1.0 - damping
    val scale = math.pow(2, 44)
    val nSeeds = nodes.agg(
      sum(when(col("__seed"), 1L).otherwise(0L)).as("n_seeds"))
    def teleport = when(col("__seed"),
      lit(tele) / col("n_seeds").cast("double")).otherwise(lit(0.0))
    var ranks = nodes.crossJoin(broadcast(nSeeds))
      .select(col("node"), col("__seed"), col("n_seeds"),
        when(col("__seed"), lit(1.0) / col("n_seeds").cast("double"))
          .otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iters) {
      ranks = ed
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("rank") / col("outdeg").cast("double") * lit(scale))
            .as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_mass"))
        .join(nodes, Seq("node"), "right")
        .crossJoin(broadcast(nSeeds))
        .select(col("node"), col("__seed"), col("n_seeds"),
          (teleport + lit(damping) *
            (coalesce(col("in_mass").cast("double"), lit(0.0)) / lit(scale)))
            .as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** DuckDB mirror of [[personalizedPageRank]]: unrolled iterations,
    * same seed-restricted teleport, same 2^44 fixed point. `edgesSql`
    * selects `src, dst`; `seedsSql` selects one column `node`.
    */
  def personalizedPageRankSql(edgesSql: String, seedsSql: String,
      iters: Int = 3, damping: Double = 0.85): String = {
    val tele = 1.0 - damping
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    (CASE WHEN n.seed THEN CAST($tele AS DOUBLE)
         |            / CAST(nt.n_seeds AS DOUBLE)
         |          ELSE 0.0 END) +
         |      CAST($damping AS DOUBLE) *
         |        (COALESCE(CAST(m.in_mass AS DOUBLE), 0.0) / 17592186044416.0)
         |      AS rank
         |  FROM nodes n
         |  LEFT JOIN (
         |    SELECT ed.dst AS node,
         |      CAST(SUM(CAST(FLOOR(r.rank / CAST(ed.outdeg AS DOUBLE)
         |            * 17592186044416.0) AS BIGINT)) AS BIGINT) AS in_mass
         |    FROM ed JOIN r${i - 1} r ON ed.src = r.node
         |    GROUP BY ed.dst) m ON n.node = m.node
         |  CROSS JOIN nt)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       |sd AS (SELECT DISTINCT node FROM ($seedsSql)),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
       |        FROM e GROUP BY src),
       |ed AS (SELECT e.src, e.dst, deg.outdeg
       |       FROM e JOIN deg ON e.src = deg.src),
       |nodes AS (
       |  SELECT n0.node, sd.node IS NOT NULL AS seed
       |  FROM (SELECT src AS node FROM e
       |        UNION SELECT dst AS node FROM e) n0
       |  LEFT JOIN sd ON n0.node = sd.node),
       |nt AS (SELECT CAST(SUM(CASE WHEN seed THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_seeds FROM nodes),
       |r0 AS (SELECT node,
       |         CASE WHEN seed THEN 1.0 / CAST(nt.n_seeds AS DOUBLE)
       |              ELSE 0.0 END AS rank
       |       FROM nodes CROSS JOIN nt),
       |$rounds
       |SELECT node, rank FROM r$iters""".stripMargin
  }

  /** Bounded k-core peeling (Seidman 1983 cores; the iterated-deletion
    * formulation): repeatedly delete nodes of degree < k, `rounds`
    * times, reporting the surviving subgraph per round — the
    * community-core extraction that strips spam tendrils and pendant
    * noise off an interaction graph before any expensive analysis runs
    * on it. A bounded round count (not "until fixed point") keeps the
    * dataflow static and the oracle unrollable; the emitted per-round
    * sizes show convergence (equal consecutive rows = fixed point
    * reached).
    *
    * Scale shape: per round, one partial-aggregating degree count and
    * two semi-joins on the node key; the surviving edge list
    * localCheckpoints each round so round r+1's three references replay
    * nothing (the pageRank barrier; eager — the lazy variant measured
    * 1.08x worse, see pageRank's note). Output: (round, n_nodes,
    * n_directed_edges) over the symmetric simple edge list.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 10, "need 1 <= rounds <= 10")
    val base = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    var e = base
      .unionByName(base.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val stats = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("src"))
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      stats += e.agg(countDistinct(col("src")).as("n_nodes"),
          count(lit(1)).as("n_directed_edges"))
        .select(lit(r).as("round"), col("n_nodes"),
          col("n_directed_edges"))
    }
    stats.reduce(_ unionByName _)
  }

  /** DuckDB mirror of [[kCorePeel]]: the rounds unrolled as CTEs.
    * `edgesSql` selects `src, dst`.
    */
  def kCorePeelSql(edgesSql: String, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""kn$r AS (
         |  SELECT src FROM (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         |                   FROM e${r - 1} GROUP BY src)
         |  WHERE d >= $k),
         |e$r AS (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN kn$r a ON e.src = a.src
         |  JOIN kn$r b ON e.dst = b.src),
         |s$r AS (
         |  SELECT $r AS round,
         |    CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
         |    CAST(COUNT(*) AS BIGINT) AS n_directed_edges
         |  FROM e$r)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds).map(r => s"SELECT * FROM s$r")
      .mkString("\nUNION ALL\n")
    s"""WITH b AS (SELECT src, dst FROM ($edgesSql) WHERE src <> dst),
       |e0 AS (SELECT DISTINCT src, dst FROM
       |        (SELECT src, dst FROM b
       |         UNION ALL SELECT dst AS src, src AS dst FROM b)),
       |$roundCtes
       |$unions""".stripMargin
  }

  /** Exact triangle count + global clustering coefficient over an
    * edge list (direction and duplicates ignored — the graph is
    * id-canonicalized to simple undirected edges first).
    *
    * Scale shape: the classic degree-ordered orientation — each
    * undirected edge is directed from its lower-(degree, id) endpoint
    * to the higher, so every node's OUT-degree is O(√m) on any graph
    * (a node with out-degree d has d neighbors of degree ≥ its own,
    * which needs d² ≤ 2m edges). The wedge self-join on the oriented
    * src key therefore fans out quadratically only in that bounded
    * out-degree, never in the raw degree — the hub that breaks the
    * naive neighbor join ("every pair of the celebrity's followers")
    * contributes nothing, because hub edges orient INTO it. Each
    * triangle is generated exactly once, at its minimum-rank vertex.
    * The closing-edge check is an id-canonical equi-join against the
    * edge set; wedge totals Σ C(deg,2) are exact longs.
    *
    * Output: one row — n_nodes, n_edges, n_wedges, n_triangles,
    * clustering (= 3·T / W, a single IEEE division of exact longs).
    */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val e = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e.select(
        when(uFirst, col("u")).otherwise(col("v")).as("a"),
        when(uFirst, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    val closed = oriented.as("x")
      .join(oriented.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(least(col("x.b"), col("y.b")).as("u"),
        greatest(col("x.b"), col("y.b")).as("v"))
      .join(und, Seq("u", "v"), "left_semi")
    // left_semi is safe as a COUNT input here (not in general): wedge
    // pairs are distinct by construction — distinct oriented edges,
    // one pair per (a, {b,c}) — so the semi-join dedups nothing
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division
    val wed = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(ne).crossJoin(wed).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3) * col("n_triangles")).cast("double") /
            col("n_wedges").cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** DuckDB mirror of [[triangleStats]] — same orientation, same
    * single-generation wedge join. `edgesSql` must alias `src`, `dst`.
    */
  def triangleStatsSql(edgesSql: String): String =
    s"""WITH raw AS ($edgesSql),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM raw WHERE src <> dst),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |o AS (
       |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
       |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b
       |  FROM und
       |  JOIN (SELECT node, deg AS du FROM deg) d1 ON u = d1.node
       |  JOIN (SELECT node, deg AS dv FROM deg) d2 ON v = d2.node),
       |tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM (SELECT least(x.b, y.b) AS u, greatest(x.b, y.b) AS v
       |        FROM o x JOIN o y ON x.a = y.a AND x.b < y.b) w
       |  WHERE EXISTS (SELECT 1 FROM und
       |                WHERE und.u = w.u AND und.v = w.v)),
       |wed AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
       |        FROM deg),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
       |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges > 0
       |    THEN CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
       |    ELSE 0.0 END AS clustering
       |FROM nn CROSS JOIN ne CROSS JOIN wed CROSS JOIN tri""".stripMargin

  /** DuckDB mirror of [[pageRank]]: the same iterations unrolled as
    * CTEs — same 2^44 fixed-point BIGINT contribution sums (floor of
    * the scaled IEEE division; deliberately NOT a decimal cast, which
    * the two engines round differently), same damping dag.
    * `edgesSql` must select columns aliased `src` and `dst`.
    */
  def pageRankSql(edgesSql: String, iters: Int = 3,
      damping: Double = 0.85): String = {
    val tele = 1.0 - damping
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST($tele AS DOUBLE) / CAST(nt.n_nodes AS DOUBLE) +
         |      CAST($damping AS DOUBLE) *
         |        (COALESCE(CAST(m.in_mass AS DOUBLE), 0.0) / 17592186044416.0)
         |      AS rank
         |  FROM nodes n
         |  LEFT JOIN (
         |    SELECT ed.dst AS node,
         |      CAST(SUM(CAST(FLOOR(r.rank / CAST(ed.outdeg AS DOUBLE)
         |            * 17592186044416.0) AS BIGINT)) AS BIGINT) AS in_mass
         |    FROM ed JOIN r${i - 1} r ON ed.src = r.node
         |    GROUP BY ed.dst) m ON n.node = m.node
         |  CROSS JOIN nt)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
       |        FROM e GROUP BY src),
       |ed AS (SELECT e.src, e.dst, deg.outdeg
       |       FROM e JOIN deg ON e.src = deg.src),
       |nodes AS (SELECT src AS node FROM e
       |          UNION SELECT dst AS node FROM e),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
       |r0 AS (SELECT node, 1.0 / CAST(nt.n_nodes AS DOUBLE) AS rank
       |       FROM nodes CROSS JOIN nt),
       |$rounds
       |SELECT node, rank FROM r$iters""".stripMargin
  }

  /** Drop keys whose group exceeds `maxDegree` rows — the fan-out
    * hygiene every key-blocked self-join in this repo applies
    * (`maxShingleDf`, `maxFpDf`, band-df caps), here for the
    * (user, item) → item-pair edge build: pair fan-out is quadratic in
    * a user's distinct-item count, so ONE bot user with 10^5 items
    * emits 5·10^9 pairs from a single shuffle key. Whole groups are
    * dropped (not sampled) so the surviving pairs carry no sampling
    * noise; the bias is explicit — co-occurrence evidence from
    * above-cap "users" (bots, crawlers, shared accounts) is discarded,
    * the standard co-occurrence hygiene.
    *
    * Scale shape: a count window partitioned on `keyCol` — the same
    * key the downstream self-join shuffles on, so the exchange is
    * reused and the cap costs no extra shuffle.
    */
  def capKeyDegree(df: DataFrame, keyCol: String, maxDegree: Int): DataFrame = {
    require(maxDegree >= 1, "maxDegree must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("__deg", count(lit(1)).over(w))
      .filter(col("__deg") <= maxDegree)
      .drop("__deg")
  }

  /** DuckDB mirror of [[capKeyDegree]] as a CTE body: selects every
    * column of `srcSql`'s output, keeping only keys at or below the cap.
    */
  def capKeyDegreeSql(srcSql: String, keyCol: String, maxDegree: Int): String =
    s"""SELECT * EXCLUDE (__deg) FROM (
       |  SELECT *, COUNT(*) OVER (PARTITION BY $keyCol) AS __deg
       |  FROM ($srcSql))
       |WHERE __deg <= $maxDegree""".stripMargin
}
