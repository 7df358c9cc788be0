package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.TableSpec
import graft.functions.Merge
import graft.streaming.StreamingMerge
import graft.streaming.StreamingMerge.{ChangeRec, KeyState}

class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("apply1: event-time wins, deterministic ties, delete beats upsert") {
    val up1 = ChangeRec("k", "upsert", "v1", ts(1000))
    val up2 = ChangeRec("k", "upsert", "v2", ts(2000))
    val del2 = ChangeRec("k", "delete", "", ts(2000))
    // newer wins regardless of application order
    val a = StreamingMerge.apply1(Some(StreamingMerge.apply1(None, up1)), up2)
    val b = StreamingMerge.apply1(Some(StreamingMerge.apply1(None, up2)), up1)
    assert(a === b && a === KeyState("v2", 2000L, live = true))
    // same-ts tie: delete wins, both orders
    val c = StreamingMerge.apply1(Some(a), del2)
    val d = StreamingMerge.apply1(Some(StreamingMerge.apply1(None, del2)), up2)
    assert(c === d && !c.live)
    // any permutation of a change set converges to the same state
    val changes = Seq(up1, up2, del2,
      ChangeRec("k", "upsert", "v0", ts(500)))
    val states = changes.permutations.take(24).map(p =>
      p.foldLeft(Option.empty[KeyState])((s, ch) =>
        Some(StreamingMerge.apply1(s, ch)))).toSeq
    assert(states.distinct.size === 1)
  }

  test("mirror: live snapshot evolves, late changes lose, deletes tombstone") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[ChangeRec]
    val q = StreamingMerge.mirror(input.toDS())
      .writeStream.format("memory").queryName("mirror")
      .outputMode(OutputMode.Update()).start()
    def snap() = spark.table("mirror")
      .as[(String, String, Long, Boolean)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3) }
    try {
      input.addData(ChangeRec("a", "upsert", "va1", ts(1000)),
        ChangeRec("b", "upsert", "vb1", ts(1000)))
      q.processAllAvailable()
      assert(snap()("a")._2 === "va1" && snap()("b")._2 === "vb1")

      // a LATE change (older event time) must not overwrite
      input.addData(ChangeRec("a", "upsert", "va0", ts(500)),
        ChangeRec("b", "upsert", "vb2", ts(2000)))
      q.processAllAvailable()
      assert(snap()("a")._2 === "va1") // late loses
      assert(snap()("b")._2 === "vb2") // newer wins

      // delete emits a dead row; a later upsert resurrects
      input.addData(ChangeRec("a", "delete", "", ts(3000)))
      q.processAllAvailable()
      val dead = spark.table("mirror")
        .as[(String, String, Long, Boolean)].collect()
        .filter(r => r._1 == "a").maxBy(_._3)
      assert(!dead._4)
      input.addData(ChangeRec("a", "upsert", "va2", ts(4000)))
      q.processAllAvailable()
      assert(snap()("a") === (("a", "va2", 4000L, true)))
    } finally q.stop()
  }

  test("changesAsStream + mirror reproduce the batch MERGE snapshot") {
    implicit val sc = spark.sqlContext
    val spec = TableSpec("t", pk = Seq("id"), regular = Seq("x", "y"))
    val snapshot = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "x", "y")
    val changes = Seq((2L, 21L, "b2", "upsert"), (3L, 0L, "", "delete"),
      (4L, 40L, "d", "upsert")).toDF("id", "x", "y", "op")
    val batch = Merge.applyChangeset(snapshot, changes, Seq("id"))
      .orderBy("id").collect().map(_.toSeq).toList

    // stream the SNAPSHOT (as upserts at t0) then the changeset (t1)
    val asUpserts = snapshot.withColumn("op", lit("upsert"))
    val input = MemoryStream[ChangeRec]
    val q = StreamingMerge.mirror(input.toDS())
      .writeStream.format("memory").queryName("mirror2")
      .outputMode(OutputMode.Update()).start()
    try {
      def recs(df: org.apache.spark.sql.DataFrame, t: Long) =
        StreamingMerge.changesAsStream(
            df.withColumn("ts", lit(ts(t))), spec, "ts")
          .as[ChangeRec].collect().toSeq
      input.addData(recs(asUpserts, 1000): _*)
      q.processAllAvailable()
      input.addData(recs(changes, 2000): _*)
      q.processAllAvailable()
      // latest state per key, live only == the batch-MERGE snapshot
      val live = spark.table("mirror2")
        .as[(String, String, Long, Boolean)].collect()
        .groupBy(_._1).map { case (_, r) => r.maxBy(_._3) }
        .filter(_._4)
        .map(r => (r._1.toLong, r._2)).toList.sortBy(_._1)
      val expected = batch.map(r =>
        (r.head.asInstanceOf[Long],
          s"""{"x":${r(1)},"y":"${r(2)}"}"""))
      assert(live === expected)
    } finally q.stop()
  }
}
