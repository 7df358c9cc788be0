package graft

import org.apache.spark.sql.functions._

import graft.functions.{Diagnostics, Sampling}

/** Layout/mixture planning operators: shard-rebalance move plans and
  * water-filling budget allocation. Both produce plans whose invariants
  * (conservation, fairness, caps) are checkable independently of the
  * DuckDB oracle mirrors.
  */
class PlannerOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shard rebalance: hand-checked move plan on a known skew") {
    // sizes 10/2/3/1, total 16, n 4 -> every target is 4; donor shard 1
    // holds all 6 excess units, receivers need 2/1/3 in shard order
    val rows = Seq.fill(10)(1L) ++ Seq.fill(2)(2L) ++
      Seq.fill(3)(3L) ++ Seq.fill(1)(4L)
    val df = rows.toDF("shard")
    val got = Diagnostics.shardRebalance(df, col("shard"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 1L), (1L, 4L, 3L)))
  }

  test("shard rebalance: applying the plan levels every shard exactly") {
    val df = (1L to 1000L).map(i => (i * i) % 37).toDF("shard")
    val plan = Diagnostics.shardRebalance(df, col("shard"))
      .as[(Long, Long, Long)].collect()
    val sizes = df.groupBy(col("shard").as("s")).count()
      .as[(Long, Long)].collect().toMap
    val n = sizes.size
    val total = sizes.values.sum
    // reconstruct the per-shard targets the planner used
    val targets = sizes.keys.toSeq.sorted.zipWithIndex.map { case (s, i) =>
      s -> (total / n + (if (i < (total % n)) 1L else 0L))
    }.toMap
    val after = sizes.map { case (s, sz) =>
      s -> (sz -
        plan.filter(_._1 == s).map(_._3).sum +
        plan.filter(_._2 == s).map(_._3).sum)
    }
    assert(after === targets)
    // minimality: every move is positive and total volume == total excess
    assert(plan.forall(_._3 > 0))
    assert(plan.map(_._3).sum ===
      sizes.map { case (s, sz) => math.max(0L, sz - targets(s)) }.sum)
  }

  test("waterfill: hand-checked levels, remainder to largest unsatisfied") {
    // caps 1/5/10, budget = 16/2 = 8: cap-1 source keeps all, level
    // (8-1) DIV 2 = 3 with remainder 1 going to the LARGER of the two
    // clipped sources (largest-first keeps allocation monotone)
    val df = Seq(("a", 1L), ("b", 5L), ("c", 10L))
      .flatMap { case (s, n) => Seq.fill(n.toInt)(s) }.toDF("src")
      .withColumn("sz", lit(1L))
    val got = Sampling.waterfillAllocate(df, "src", col("sz"), 1, 2)
      .select("stratum", "capacity", "allocated", "truncated")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 1L, 1L, false)))
    assert(got("b") === (("b", 5L, 3L, true)))
    assert(got("c") === (("c", 10L, 4L, true)))
  }

  test("waterfill invariants: sum == budget, caps respected, monotone") {
    val df = (1L to 500L).map(i => (s"s${i % 13}", (i * 7) % 101))
      .toDF("src", "sz")
    val got = Sampling.waterfillAllocate(df, "src", col("sz"), 3, 10)
      .select("capacity", "allocated")
      .as[(Long, Long)].collect().sortBy(_._1)
    val totalCap = got.map(_._1).sum
    assert(got.map(_._2).sum === totalCap * 3 / 10)
    assert(got.forall { case (cap, a) => a <= cap && a >= 0 })
    // max-min fairness: allocation is nondecreasing in capacity
    got.sliding(2).foreach {
      case Array((c1, a1), (c2, a2)) => assert(a1 <= a2 || c1 == c2)
      case _ =>
    }
    // all-fit degenerate case: budget >= total leaves everything intact
    val full = Sampling.waterfillAllocate(df, "src", col("sz"), 1, 1)
      .select("capacity", "allocated", "truncated")
      .as[(Long, Long, Boolean)].collect()
    assert(full.forall { case (c, a, t) => c == a && !t })
  }
}
