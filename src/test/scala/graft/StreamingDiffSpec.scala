package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.core.{Classification => C}
import graft.streaming.StreamingDiff
import graft.streaming.StreamingDiff.{Change, PartitionState}

class StreamingDiffSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("classify covers the full taxonomy") {
    assert(StreamingDiff.classify(PartitionState(Some(1L), None)) === C.OnlyInSource)
    assert(StreamingDiff.classify(PartitionState(None, Some(1L))) === C.OnlyInTarget)
    assert(StreamingDiff.classify(PartitionState(Some(1L), Some(1L))) === C.Matched)
    assert(StreamingDiff.classify(PartitionState(Some(1L), Some(2L))) === C.PartitionMismatch)
  }

  test("stateful stream: verdicts evolve as both sides report") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamingDiff.verdicts(input.toDS())
      .writeStream.format("memory").queryName("verdicts")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: only source has the partition
      input.addData(Change("source", 10L, "k1", 100L, ts(1000)))
      q.processAllAvailable()
      val v1 = spark.table("verdicts").as[(String, Long, String)].collect()
      assert(v1.toSet === Set(("k1", 10L, C.OnlyInSource)))

      // batch 2: target catches up with the same row hash -> MATCHED
      input.addData(Change("target", 10L, "k1", 100L, ts(2000)))
      q.processAllAvailable()
      val v2 = spark.table("verdicts").as[(String, Long, String)].collect()
      assert(v2.contains(("k1", 10L, C.Matched)))

      // batch 3: source mutates -> PARTITION_MISMATCH
      input.addData(Change("source", 10L, "k1", 999L, ts(3000)))
      q.processAllAvailable()
      val v3 = spark.table("verdicts").as[(String, Long, String)].collect()
      assert(v3.contains(("k1", 10L, C.PartitionMismatch)))
    } finally q.stop()
  }

  test("streaming dedup: cross-batch duplicates dropped within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingDedup.dropExactDups(docs, "text", "ts")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "alpha doc", ts(1000)), (2L, "beta doc", ts(2000)))
      q.processAllAvailable()
      // same content again (different id, later ts) + one new doc
      input.addData((3L, "alpha doc", ts(3000)), (4L, "gamma doc", ts(4000)))
      q.processAllAvailable()
      val kept = spark.table("deduped").select("doc_id")
        .as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 4L)) // doc 3 was an exact dup of doc 1
    } finally q.stop()
  }

  test("streaming decontamination: stream verdicts equal the batch prober's") {
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val batchDocs = Seq(
      (1L, "a b c d e f g h i j"),          // verbatim leak
      (2L, "z z a b c d e f g h i j z z"),  // partial overlap
      (3L, "p q r s t u v w x y"))          // clean
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("doc_id", "text")
    val q = graft.streaming.StreamingDecontaminate
      .flagged(stream, bench, "doc_id", "text")
      .writeStream.format("memory").queryName("decon")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batchDocs.take(2): _*)
      q.processAllAvailable()
      input.addData(batchDocs.drop(2): _*) // second micro-batch
      q.processAllAvailable()
      val got = spark.table("decon")
        .select("doc_id", "n_shingles", "n_flagged")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = graft.functions.Decontaminate
        .bloomNgramHits(batchDocs.toDF("doc_id", "text"), bench,
          "doc_id", "text")
        .select("doc_id", "n_shingles", "n_flagged")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got.keySet === Set(1L, 2L, 3L))
      assert(got(1L)._1 === got(1L)._2) // verbatim: everything flagged
      want.foreach { case (id, v) => assert(got(id) === v, s"doc $id") }
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range semantics") {
    import graft.streaming.StreamingJoin
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingJoin.within(
      signups.toDS().toDF("user_id", "s_ts"),
      purchases.toDS().toDF("user_id", "p_ts", "amount"),
      "user_id", "s_ts", "p_ts", horizon = "1 hour")
    val q = joined.select("user_id", "s_ts", "p_ts", "amount")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // base epoch well above 0: a row whose event time equals the
      // initial watermark (epoch 0) is discarded as late
      val base = 1700000000000L
      signups.addData((1L, ts(base)), (2L, ts(base)))
      purchases.addData(
        (1L, ts(base + 30 * 60 * 1000), 5.0), // inside the hour -> joins
        (1L, ts(base + 90 * 60 * 1000), 7.0), // past the horizon -> dropped
        (2L, ts(base + 60 * 60 * 1000), 9.0), // exactly on the bound -> joins
        (3L, ts(base + 10 * 60 * 1000), 1.0)) // no signup -> dropped
      q.processAllAvailable()
      // advance both watermarks so all joinable results are emitted
      signups.addData((99L, ts(base + 10L * 3600 * 1000)))
      purchases.addData((99L, ts(base + 10L * 3600 * 1000), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssjoin")
        .filter(org.apache.spark.sql.functions.col("user_id") < 99)
        .select("user_id", "amount").as[(Long, Double)].collect().toSet
      assert(got === Set((1L, 5.0), (2L, 9.0)))
    } finally q.stop()
  }

  test("space-saving merge: hand-computed eviction counts and error bounds") {
    import graft.streaming.StreamingHeavyHitters.{SsEntry, merge}
    // capacity 2: a(5) b(3) then c(2) evicts the (count,key)-min b —
    // c inherits b's count as its error ceiling
    val t = merge(Vector.empty, Seq("a" -> 5L, "b" -> 3L, "c" -> 2L), 2)
    assert(t.map(e => e.key -> ((e.count, e.err))).toMap ===
      Map("a" -> ((5L, 0L)), "c" -> ((5L, 3L))))
    // true counts respect [count - err, count] for every entry
    assert(5L >= 5L - 0L && 2L >= 5L - 3L && 2L <= 5L)
  }

  test("streaming heavy hitters: skewed keys surface with valid bounds") {
    import graft.streaming.StreamingHeavyHitters
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingHeavyHitters.topK(
        input.toDS().toDF("id", "key"),
        org.apache.spark.sql.functions.lit("g"), "key",
        capacity = 8, k = 3)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      input.addData(
        (1 to 30).map(i => (i.toLong, "hot")) ++
        (1 to 10).map(i => (100L + i, "warm")) ++
        (1 to 10).map(i => (200L + i, s"u$i")): _*)
      q.processAllAvailable()
      val snap1 = spark.table("hh")
        .select("key", "count", "err", "rank")
        .as[(String, Long, Long, Long)].collect()
      // hot and warm exact (never evicted); rank 3 is a 2-count survivor
      // with err 1 from the single eviction it absorbed
      assert(snap1.length === 3)
      assert(snap1.contains(("hot", 30L, 0L, 1L)))
      assert(snap1.contains(("warm", 10L, 0L, 2L)))
      val third = snap1.find(_._4 == 3L).get
      assert(third._2 === 2L && third._3 === 1L)
      // batch 2: hot grows, a new key displaces a singleton
      input.addData((1 to 5).map(i => (300L + i, "hot")) ++
        (1 to 4).map(i => (400L + i, "new")): _*)
      q.processAllAvailable()
      val snap2 = spark.table("hh")
        .select("key", "count", "err", "rank")
        .as[(String, Long, Long, Long)].collect().drop(snap1.length)
      assert(snap2.contains(("hot", 35L, 0L, 1L)))
      assert(snap2.contains(("warm", 10L, 0L, 2L)))
      assert(snap2.contains(("new", 5L, 1L, 3L)))
    } finally q.stop()
  }

  test("snapshot adapter produces matching hashes for identical rows") {
    val t = Seq((1L, 1, "a", 10), (2L, 1, "b", 20)).toDF("pk", "c1", "v1", "v2")
    val spec = graft.core.TableSpec("t", Seq("pk"), Seq("c1"), Seq("v1", "v2"))
    val src = StreamingDiff.snapshotAsChanges(t, spec, "source")
    val tgt = StreamingDiff.snapshotAsChanges(t, spec, "target")
    val joined = src.select($"pk", $"rowHash".as("sh"))
      .join(tgt.select($"pk", $"rowHash".as("th")), "pk")
    assert(joined.filter($"sh" =!= $"th").count() === 0)
  }
}
