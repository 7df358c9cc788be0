package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters
import graft.functions.HeavyHitters.{MGSummary, MisraGries}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def runMG(k: Int, items: Seq[String]): MGSummary = {
    val agg = new MisraGries(k)
    items.foldLeft(agg.zero)(agg.reduce)
  }

  test("MG summary keeps at most k counters and never loses a heavy hitter") {
    // 600 'a', 300 'b', 1 each of 200 distinct fillers: n=1100, k=3
    // guarantee: every item with count > n/(k+1)=275 must survive
    val items = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      (0 until 200).map(i => s"f$i")
    val s = runMG(3, scala.util.Random.shuffle(items))
    assert(s.n === 1100)
    assert(s.counts.size <= 3)
    assert(s.counts.contains("a") && s.counts.contains("b"))
    // counters are lower bounds with error <= n/(k+1)
    assert(s.counts("a") <= 600 && s.counts("a") >= 600 - 1100 / 4)
    assert(s.counts("b") <= 300 && s.counts("b") >= 300 - 1100 / 4)
  }

  test("MG merge preserves totals, the k bound, and the error bound") {
    val agg = new MisraGries(4)
    val xs = Seq.fill(100)("hot") ++ (0 until 50).map(i => s"x$i") ++ Seq.fill(40)("warm")
    val ys = Seq.fill(80)("hot") ++ (0 until 60).map(i => s"y$i") ++ Seq.fill(45)("warm")
    val merged = agg.merge(runMG(4, xs), runMG(4, ys))
    val n = xs.size + ys.size
    assert(merged.n === n)
    assert(merged.counts.size <= 4)
    // true counts: hot=180, warm=85; bound: survives if > n/(k+1)=75
    assert(merged.counts.contains("hot") && merged.counts.contains("warm"))
    assert(merged.counts("hot") >= 180 - n / 5 && merged.counts("hot") <= 180)
    assert(merged.counts("warm") >= 85 - n / 5 && merged.counts("warm") <= 85)
  }

  test("heavyTerms equals the exact groupBy answer on real data") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val got = HeavyHitters.heavyTerms(docs, "text", 1L, 150L, k = 200)
      .select("term", "cnt", "n_tokens").as[(String, Long, Long)]
      .collect().sortBy(_._1)
    val tok = docs.select(explode(split(col("text"), " ")).as("term"))
    val n = tok.count()
    val want = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 150 >= n)
      .select(col("term"), col("cnt"), lit(n).as("n"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("heavyTerms rejects a k below the recall guarantee") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyTerms(docs, "text", 1L, 150L, k = 100)
    }
  }
}
