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
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
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

  /** DuckDB mirror of [[pageRank]]: the same iterations unrolled as
    * CTEs — same decimal(38,18) contribution sums, same damping dag.
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
}
