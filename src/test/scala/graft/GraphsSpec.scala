package graft

import org.apache.spark.sql.functions._

import graft.functions.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // undirected triangle + a pendant: 1-2, 2-3, 1-3, 3-4 (both directions)
  private lazy val edges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
    (3L, 4L), (4L, 3L))
    .toDF("src", "dst")

  test("pageRank: mass conserved and the high-degree node ranks first") {
    val pr = Graphs.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size === 4)
    // dangling-free symmetric graph: total mass stays ~1 (only the
    // 2^-44 fixed-point floor leaks, a few ulps across 5 iterations)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // node 3 has degree 3 (2 in the triangle + the pendant), nodes 1,2
    // degree 2, node 4 degree 1 — rank order must follow
    assert(pr(3L) > pr(1L) && pr(3L) > pr(2L))
    assert(pr(1L) > pr(4L) && pr(2L) > pr(4L))
    // symmetric roles: 1 and 2 are automorphic, ranks identical
    assert(pr(1L) === pr(2L))
  }

  test("pageRank: a regular graph stays uniform at 1/n") {
    // 4-cycle, both directions: every node has in/out degree 2
    val cyc = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val pr = Graphs.pageRank(cyc, "src", "dst", iters = 3)
      .collect().map(_.getDouble(1))
    pr.foreach(r => assert(math.abs(r - 0.25) < 1e-9))
  }

  test("triangleStats: counts the one triangle; hub wedges stay open") {
    // triangle 1-2-3 + pendant 3-4 (input deliberately messy: one
    // duplicate edge, one reversed, one self-loop — all canonicalized)
    val messy = edges
      .union(Seq((2L, 1L), (4L, 3L), (5L, 5L)).toDF("src", "dst"))
    val r = Graphs.triangleStats(messy, "src", "dst").collect()(0)
    assert(r.getLong(0) === 4) // nodes (self-loop-only node 5 dropped)
    assert(r.getLong(1) === 4) // edges
    // wedges: deg(1)=2, deg(2)=2, deg(3)=3, deg(4)=1 -> 1+1+3+0 = 5
    assert(r.getLong(2) === 5)
    assert(r.getLong(3) === 1) // the single triangle
    assert(math.abs(r.getDouble(4) - 3.0 / 5.0) < 1e-15)
  }

  test("triangleStats: complete graph K4 has C(4,3) triangles, coeff 1") {
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("src", "dst")
    val r = Graphs.triangleStats(k4, "src", "dst").collect()(0)
    assert(r.getLong(3) === 4)
    assert(r.getDouble(4) === 1.0)
  }

  test("pageRank: matches a driver-side reference power iteration") {
    // tiny directed-but-dangling-free graph: 1->2, 2->3, 3->1, 3->2
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val got = Graphs.pageRank(g, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: plain double power iteration (no fixed-point) — the
    // 2^-44 quantization keeps the engine within 1e-9 of it
    val out = Map(1L -> Seq(2L), 2L -> Seq(3L), 3L -> Seq(1L, 2L))
    var rank = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val contrib = out.toSeq.flatMap { case (s, ds) =>
        ds.map(d => d -> rank(s) / ds.size)
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rank = rank.keys.map(n =>
        n -> (0.15 / 3 + 0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    rank.foreach { case (n, r) => assert(math.abs(got(n) - r) < 1e-9) }
  }

  test("personalizedPageRank: matches a driver-side reference; seed-local mass") {
    // path graph 1-2-3-4 (undirected), teleport pinned to {1}
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val pr = Graphs.personalizedPageRank(path, "src", "dst", seeds, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // plain double power iteration, teleport only on node 1 — the
    // 2^-44 quantization keeps the engine within 1e-9
    val out = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
      4L -> Seq(3L))
    var rank = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0)
    for (_ <- 1 to 5) {
      val contrib = out.toSeq.flatMap { case (s, ds) =>
        ds.map(d => d -> rank(s) / ds.size)
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rank = rank.keys.map(n => n ->
        ((if (n == 1L) 0.15 else 0.0) + 0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    rank.foreach { case (n, r) => assert(math.abs(pr(n) - r) < 1e-9) }
    // mass conserved up to fixed-point dust, concentrated near the seed
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(1L) + pr(2L) > 0.7)
    // seeds not in the graph are ignored; seeding everything uniformly
    // recovers plain pageRank exactly (same dag, same constants)
    val all = Seq(1L, 2L, 3L, 4L, 99L).toDF("node")
    val pprAll = Graphs.personalizedPageRank(path, "src", "dst", all, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = Graphs.pageRank(path, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    plain.foreach { case (n, r) => assert(pprAll(n) === r) }
  }

  test("personalizedPageRank: empty or graph-disjoint seeds fail fast, never NaN") {
    val path = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // empty seed frame: teleport mass has nowhere to land
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(path, "src", "dst",
        Seq.empty[Long].toDF("node"), iters = 1)
    }
    // seeds fully disjoint from the edge list: same division by zero
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(path, "src", "dst",
        Seq(42L, 43L).toDF("node"), iters = 1)
    }
  }

  test("kCorePeel: pendant strips in round 1, the triangle is the fixed point") {
    // triangle 1-2-3 plus pendant 3-4 (one direction given; peel
    // symmetrizes); at k=2 the pendant dies round 1, then stability
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val rows = Graphs.kCorePeel(g, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows(0) === ((1, 3L, 6L))) // triangle: 3 nodes, 6 directed edges
    assert(rows(1) === ((2, 3L, 6L))) // fixed point
    assert(rows(2) === ((3, 3L, 6L)))
    // a chain has no 2-core: everything peels away within 2 rounds
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val gone = Graphs.kCorePeel(chain, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(gone.last._2 === 0L)
  }

  test("capKeyDegree: drops the bot user's group whole, bounding pair fan-out") {
    // one bot user with 100 distinct items (4950 pairs uncapped) plus
    // two normal users — the cap must drop the bot ENTIRELY (no
    // sampling noise) and leave everyone else untouched
    val items = ((1 to 100).map(i => ("bot", i.toLong)) ++
      Seq(("a", 1L), ("a", 2L), ("b", 5L))).toDF("user_id", "item")
    val capped = Graphs.capKeyDegree(items, "user_id", 10)
    assert(capped.select("user_id").distinct().as[String].collect().toSet
      === Set("a", "b"))
    assert(capped.count() === 3)
    val pairs = capped.as("x").join(capped.as("y"),
      col("x.user_id") === col("y.user_id") && col("x.item") < col("y.item"))
    assert(pairs.count() === 1)
    // a cap at exactly the bot's degree keeps it (<=, not <)
    assert(Graphs.capKeyDegree(items, "user_id", 100).count() === 103)
  }

  test("capKeyDegree SQL mirror: same survivors as the Spark side") {
    val items = ((1 to 20).map(i => ("bot", i.toLong)) ++
      Seq(("a", 1L), ("a", 2L))).toDF("user_id", "item")
    items.createOrReplaceTempView("cap_items")
    val viaSql = spark.sql(
      // the DuckDB mirror uses EXCLUDE, which Spark SQL also accepts as
      // EXCEPT — assert the semantics, not the dialect keyword
      """SELECT user_id, item FROM (
        |  SELECT *, COUNT(*) OVER (PARTITION BY user_id) AS __deg
        |  FROM cap_items) WHERE __deg <= 10""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaApi = Graphs.capKeyDegree(items, "user_id", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql === viaApi)
    assert(viaApi === Set(("a", 1L), ("a", 2L)))
  }
}
