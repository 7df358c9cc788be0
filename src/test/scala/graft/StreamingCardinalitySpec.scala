package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.Cardinality
import graft.streaming.StreamingCardinality

/** The streaming HLL's contract: its running snapshot is bit-identical
  * to the batch sketch over everything seen so far — mergeability as a
  * streaming invariant, not an approximation.
  */
class StreamingCardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("snapshot after N batches equals the batch sketch over the union") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StreamingCardinality
      .distinctByKey(input.toDF().toDF("grp", "v"), "grp", "v")
      .writeStream.format("memory").queryName("ndv_stream")
      .outputMode(OutputMode.Update()).start()
    def latest(g: String): Double = spark.table("ndv_stream")
      .as[(String, Int, Double)].collect()
      .filter(_._1 == g).last._3
    try {
      val batch1 = (1L to 1500L).map(("x", _))
      val batch2 = (1000L to 2500L).map(("x", _)) // overlaps batch1
      input.addData(batch1: _*)
      q.processAllAvailable()
      val afterOne = latest("x")
      val batchOne = Cardinality
        .hllNdv(batch1.toDF("grp", "v"), Seq.empty, "v")
        .collect().head.getDouble(0)
      assert(afterOne === batchOne) // exact, not approximate, equality

      input.addData(batch2: _*)
      q.processAllAvailable()
      val afterTwo = latest("x")
      val batchBoth = Cardinality
        .hllNdv((batch1 ++ batch2).toDF("grp", "v"), Seq.empty, "v")
        .collect().head.getDouble(0)
      assert(afterTwo === batchBoth)
      // and the estimate is sane: 2500 true distincts, m=256 envelope
      assert(math.abs(afterTwo - 2500.0) / 2500.0 < 0.26)
    } finally q.stop()
  }

  test("null values match the batch phantom register bit for bit (no NPE)") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, java.lang.Long)]
    val q = StreamingCardinality
      .distinctByKey(input.toDF().toDF("grp", "v"), "grp", "v")
      .writeStream.format("memory").queryName("ndv_nulls")
      .outputMode(OutputMode.Update()).start()
    try {
      val vals: Seq[java.lang.Long] =
        (1L to 600L).map(java.lang.Long.valueOf) ++ Seq(null, null)
      input.addData(vals.map(("x", _)): _*)
      q.processAllAvailable() // pre-fix this NPE'd the query
      val got = spark.table("ndv_nulls")
        .as[(String, Int, Double)].collect().filter(_._1 == "x").last
      val batch = Cardinality
        .hllNdv(vals.toDF("v"), Seq.empty, "v")
        .collect().head.getDouble(0)
      assert(got._3 === batch) // exact equality, nulls included
      // the phantom register counts as occupied, exactly like the batch
      // estimate's count over the null-bucket row
      val batchOcc = Cardinality
        .hllRegisters(vals.toDF("v"), Seq.empty, "v").count()
      assert(got._2.toLong === batchOcc)
    } finally q.stop()
  }

  test("pre-phantom-flag checkpoint state (1<<p bytes) is padded, not AIOOBE'd") {
    // a checkpoint written before the phantom flag existed holds a
    // 1<<p-length register array; foldInto on a null value must not write
    // out of bounds after the state is padded at retrieval
    val p = 8
    val old = new Array[Byte](1 << p) // old-format state
    val padded = java.util.Arrays.copyOf(old, (1 << p) + 1)
    StreamingCardinality.foldInto(padded, null, p) // the phantom write
    assert(padded(1 << p) === 1)
    // and non-null folding into the padded array matches folding into a
    // fresh new-format array (registers unaffected by the pad)
    val fresh = new Array[Byte]((1 << p) + 1)
    (1 to 200).foreach { i =>
      StreamingCardinality.foldInto(padded, s"v$i", p)
      StreamingCardinality.foldInto(fresh, s"v$i", p)
    }
    fresh(1 << p) = 1
    assert(StreamingCardinality.estimate(padded, p) ===
      StreamingCardinality.estimate(fresh, p))
  }

  test("groups keep independent registers") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StreamingCardinality
      .distinctByKey(input.toDF().toDF("grp", "v"), "grp", "v")
      .writeStream.format("memory").queryName("ndv_groups")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L to 800L).map(("a", _)) ++ Seq(("b", 1L)): _*)
      q.processAllAvailable()
      val rows = spark.table("ndv_groups")
        .as[(String, Int, Double)].collect().groupBy(_._1)
      val a = rows("a").last
      val b = rows("b").last
      assert(a._2 > 100 && b._2 === 1) // occupied registers
      val soloB = Cardinality.hllNdv(Seq(1L).toDF("v"), Seq.empty, "v")
        .collect().head.getDouble(0)
      assert(b._3 === soloB)
    } finally q.stop()
  }
}
