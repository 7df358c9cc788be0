package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest at-or-before right row per key; no match => nulls") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any right row
      (3L, ts("2024-01-01 09:00:00"), "p4")  // key with no right rows
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 10:00:00"), 300L)
    ).toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .select("name", "rid_r").as[(String, Option[Long])].collect().toMap
    assert(got === Map("p1" -> Some(100L), "p2" -> Some(200L),
      "p3" -> None, "p4" -> None))
  }

  test("asof join: equal timestamps are inclusive (right visible to left)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .select("rid_r").as[Long].collect()
    assert(got.toSeq === Seq(7L))
  }

  test("asof join tolerance: stale matches become no-match, fresh ones survive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"), // 10 min after right: within
      (1L, ts("2024-01-01 12:00:00"), "stale")  // 130 min after: out
    ).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:50:00"), 5L)).toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("rid"),
        toleranceMicros = Some(30L * 60 * 1000000))
      .select("name", "rid_r").as[(String, Option[Long])].collect().toMap
    assert(got === Map("fresh" -> Some(5L), "stale" -> None))
  }

  test("asof join: NULL payload on the matched row stays NULL (no smear from older rows)") {
    // DuckDB ASOF LEFT JOIN picks ONE right row; its payload nulls are
    // kept. A per-column last(ignoreNulls) fill would pull a=100 from the
    // older 10:00 row while b comes from 11:00 — columns from two rows.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100L), "old"),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Long], "new")
    ).toDF("k", "t", "a", "b")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("a", "b"))
      .select("a_r", "b_r").as[(Option[Long], String)].collect().toSeq
    assert(got === Seq((None, "new")))
  }

  test("range join: boundary-inclusive containment, multi-bin spans, all matches") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),  // == interval start
      (1L, ts("2024-01-01 11:00:00"), "b"),  // == interval end (1h wide)
      (1L, ts("2024-01-01 11:00:01"), "c"),  // just outside
      (2L, ts("2024-01-01 10:30:00"), "d")   // inside a 2-interval overlap
    ).toDF("k", "t", "name")
    val ivs = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i1"),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i2"),
      (2L, ts("2024-01-01 09:45:00"), ts("2024-01-01 10:45:00"), "i3")
    ).toDF("k", "lo", "hi", "iv")
    val got = Joins.rangeJoin(points, ivs, Seq("k"), "t", "lo", "hi",
        binMicros = 600000000L) // 10-minute bins: intervals span 7 bins
      .select("name", "iv").as[(String, String)].collect().toSet
    assert(got === Set(("a", "i1"), ("b", "i1"), ("d", "i2"), ("d", "i3")))
  }

  test("range join: degenerate wide interval is clamped to the broadcast path") {
    val points = Seq(
      (1L, ts("2024-06-15 12:00:00"), "p1"),  // inside both intervals
      (1L, ts("2025-07-01 00:00:00"), "p2"),  // outside both
      (2L, ts("2024-06-15 12:00:00"), "p3")   // right time, wrong key
    ).toDF("k", "t", "name")
    val ivs = Seq(
      // ~8,784 one-hour bins — far past the 1,024 clamp: must NOT explode
      (1L, ts("2024-01-01 00:00:00"), ts("2024-12-31 23:59:59"), "year"),
      (1L, ts("2024-06-15 11:00:00"), ts("2024-06-15 13:00:00"), "narrow")
    ).toDF("k", "lo", "hi", "iv")
    val joined = Joins.rangeJoin(points, ivs, Seq("k"), "t", "lo", "hi")
    assert(joined.select("name", "iv").as[(String, String)].collect().toSet ===
      Set(("p1", "year"), ("p1", "narrow")))
    // wide intervals ride a broadcast-HASH equi-join (key cols), never a
    // nested loop; the narrow population keeps the binned equi-join
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // routing is result-invariant: all-broadcast and all-binned agree
    def result(cap: Int) =
      Joins.rangeJoin(points, ivs, Seq("k"), "t", "lo", "hi",
          maxBinsPerInterval = cap)
        .select("name", "iv").as[(String, String)].collect().toSet
    assert(result(1) === result(1000000))
  }

  test("asof join property: equals the naive per-key reference on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic random instance: ~40 keys, clustered timestamps so
    // before/at/after cases and equal-ts ties all occur
    val rowGen = for {
      k <- Gen.choose(0L, 39L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t)
    def sample(n: Int, seed: Long): List[(Long, Long)] =
      Gen.listOfN(n, rowGen).apply(Gen.Parameters.default, Seed(seed)).get
    val leftRows = sample(300, 1L).zipWithIndex
      .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong) }
    val rightRows = sample(200, 2L).zipWithIndex
      // distinct (key, ts) on the right: drop later duplicates so the
      // reference pick is unambiguous
      .map { case ((k, t), i) => (k, t, 10000L + i) }
      .groupBy { case (k, t, _) => (k, t) }.map(_._2.head).toList
      .map { case (k, t, rid) => (k, new Timestamp(t * 1000), rid) }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .select("lid", "rid_r").as[(Long, Option[Long])].collect().toMap
    // naive reference: latest right row with ts <= left ts, per key
    val byKey = rightRows.groupBy(_._1)
    val want = leftRows.map { case (k, t, lid) =>
      val cands = byKey.getOrElse(k, Nil).filter(!_._2.after(t))
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === want)
  }

  test("both joins plan without nested-loop or cartesian operators") {
    val ev = graft.engine.Tables.events(spark, Sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val sg = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id", "value")
    val asof = Joins.asofJoin(p, sg, Seq("user_id"), "ts", Seq("event_id"))
    val sessions = sg.select(col("user_id"), col("ts").as("lo"),
      (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"), col("event_id").as("sid"))
    val rng = Joins.rangeJoin(p.select("user_id", "ts", "event_id"),
      sessions, Seq("user_id"), "ts", "lo", "hi")
    Seq(asof, rng).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      assert(!plan.contains("CartesianProduct"), plan.take(1500))
      assert(df.count() > 0)
    }
  }

  test("interval join: closed-interval overlaps, multi-bin pair emitted once") {
    // default bin = 1 h. a1 spans 3 bins; b1 overlaps it across 2 shared
    // bins (must appear exactly once); b2 touches a1 only at the exact
    // endpoint (closed => match); b3 same key but disjoint; b4 other key
    val a = Seq(
      (1L, 100L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00")),
      (2L, 101L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "a_id", "a_start", "a_end")
    val b = Seq(
      (1L, 200L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")),
      (1L, 201L, ts("2024-01-01 12:30:00"), ts("2024-01-01 14:00:00")),
      (1L, 202L, ts("2024-01-01 08:00:00"), ts("2024-01-01 09:00:00")),
      (3L, 203L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")))
      .toDF("k", "b_id", "b_start", "b_end")
    val got = Joins.intervalJoin(a, b, Seq("k"),
        "a_start", "a_end", "b_start", "b_end")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted === Seq((100L, 200L), (100L, 201L)))
    assert(got.size === got.toSet.size, "a pair was emitted more than once")
    val plan = Joins.intervalJoin(a, b, Seq("k"),
        "a_start", "a_end", "b_start", "b_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("interval join property: equals the naive all-pairs overlap on random data") {
    val rnd = new scala.util.Random(20260814)
    def mk(n: Int, base: Long) = (0 until n).map { i =>
      val k = 1L + rnd.nextInt(5)
      val start = rnd.nextInt(500000).toLong // ms
      val len = rnd.nextInt(120000).toLong   // up to 2 min ≈ multi-bin at 1-min bins
      (k, base + i, new Timestamp(start), new Timestamp(start + len))
    }
    val a = mk(120, 1000L).toDF("k", "a_id", "a_start", "a_end")
    val b = mk(150, 2000L).toDF("k", "b_id", "b_start", "b_end")
    val got = Joins.intervalJoin(a, b, Seq("k"),
        "a_start", "a_end", "b_start", "b_end", binMicros = 60L * 1000000)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val av = a.as[(Long, Long, Timestamp, Timestamp)].collect()
    val bv = b.as[(Long, Long, Timestamp, Timestamp)].collect()
    val want = for {
      (ka, ai, as_, ae) <- av
      (kb, bi, bs, be) <- bv
      if ka == kb && !as_.after(be) && !bs.after(ae)
    } yield (ai, bi)
    assert(got.size === got.toSet.size, "duplicate pair emitted")
    assert(got.toSet === want.toSet,
      s"missing ${(want.toSet -- got.toSet).take(3)}, extra ${(got.toSet -- want.toSet).take(3)}")
  }

  test("salted join equals the plain join and spreads the hot key") {
    import org.apache.spark.sql.functions._
    // 90% of the large side lands on one hot key
    val large = spark.range(2000).toDF("row_id")
      .withColumn("k", when(col("row_id") % 10 < 9, 7L).otherwise(col("row_id") % 5))
      .withColumn("v", col("row_id") * 3)
    val small = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("row_id", "k", "name")
    val salted = Joins.saltedJoin(large, small, Seq("k"), "row_id", 8)
      .select("row_id", "k", "name")
    assert(salted.collect().toSet === plain.collect().toSet)
    // with broadcast off, the shuffle key must include the salt — that is
    // what spreads key 7 across 8 reducers instead of one
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Joins.saltedJoin(large, small, Seq("k"), "row_id", 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), plan.take(2000))
      assert("hashpartitioning\\(k#\\d+L?, __salt".r.findAllIn(plan).nonEmpty,
        plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // left_outer keeps unmatched large rows exactly once
    val lo = Joins.saltedJoin(large.filter(col("k") === 3L), small,
      Seq("k"), "row_id", 4, "left_outer")
    assert(lo.filter(col("name").isNull).count() ===
      large.filter(col("k") === 3L).count())
  }
}
