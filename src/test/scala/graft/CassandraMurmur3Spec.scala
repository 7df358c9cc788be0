package graft

import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, TableSpec}
import graft.engine.DiffEngine
import graft.functions.CassandraMurmur3

class CassandraMurmur3Spec extends SparkSpec {
  import spark.implicits._

  /** Canonical MurmurHash3 x64_128 h1 (UNSIGNED tail) for cross-checking:
    * on inputs whose tail bytes are all < 0x80 the Cassandra signed
    * variant must agree with the canonical algorithm exactly.
    */
  private def canonicalH1(data: Array[Byte]): Long = {
    // reuse guava (ships with Spark) as the independent canonical impl
    val h = com.google.common.hash.Hashing.murmur3_128().hashBytes(data).asBytes()
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (h(i) & 0xffL); i -= 1 }
    v
  }

  test("agrees with canonical murmur3 on ASCII / low-byte inputs") {
    val cases = Seq(
      "".getBytes, "a".getBytes, "hello".getBytes, "key1".getBytes,
      "0123456789abcdef".getBytes,            // exactly one block
      "0123456789abcdefXYZ".getBytes,         // block + short tail
      Array[Byte](0, 1, 2, 3, 4, 5, 6, 7),
      Array.tabulate(33)(i => (i % 127).toByte))
    cases.foreach { b =>
      assert(CassandraMurmur3.hash64(b) === canonicalH1(b),
        s"input len ${b.length}")
    }
  }

  test("signed-tail deviation: differs from canonical when tail has high bytes") {
    val highTail = Array.tabulate(17)(i => if (i == 16) 0x80.toByte else i.toByte)
    assert(CassandraMurmur3.hash64(highTail) !== canonicalH1(highTail))
  }

  test("token normalizes Long.MinValue and is deterministic") {
    val b = "whatever".getBytes
    assert(CassandraMurmur3.token(b) === CassandraMurmur3.token(b.clone()))
  }

  test("column expression: long pk tokens match the scalar impl; null-safe") {
    val df = Seq(Some(1L), Some(42L), None).toDF("pk")
    val got = df.select(CassandraMurmur3.tokenColumn(Seq(col("pk"))).as("t"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(CassandraMurmur3.token(CassandraMurmur3.serializeLong(1L))))
    assert(got(1).contains(CassandraMurmur3.token(CassandraMurmur3.serializeLong(42L))))
    assert(got(2).isEmpty)
  }

  test("composite keys use the length-prefixed envelope") {
    val df = Seq((7L, "x")).toDF("a", "b")
    val got = df.select(CassandraMurmur3.tokenColumn(Seq(col("a"), col("b"))).as("t"))
      .collect()(0).getLong(0)
    val expected = CassandraMurmur3.token(CassandraMurmur3.composite(
      Array(CassandraMurmur3.serializeLong(7L), "x".getBytes)))
    assert(got === expected)
  }

  test("token expression survives CODEGEN_ONLY (single and composite keys)") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val df = Seq((7L, "x", Some(3)), (8L, "y", None)).toDF("a", "b", "c")
      val rows = df.select(
        CassandraMurmur3.tokenColumn(Seq(col("a"))).as("single"),
        CassandraMurmur3.tokenColumn(Seq(col("a"), col("b"))).as("composite"),
        CassandraMurmur3.tokenColumn(Seq(col("a"), col("c"))).as("with_null"))
        .collect()
      assert(rows(0).getLong(0) ===
        CassandraMurmur3.token(CassandraMurmur3.serializeLong(7L)))
      assert(rows(0).getLong(1) === CassandraMurmur3.token(CassandraMurmur3.composite(
        Array(CassandraMurmur3.serializeLong(7L), "x".getBytes))))
      assert(!rows(0).isNullAt(2) && rows(1).isNullAt(2)) // null component ⇒ null token
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("plugs into DiffEngine as the token function") {
    val t = Seq((1L, 1, "a", 10), (2L, 1, "b", 20)).toDF("pk", "c1", "v1", "v2")
    val spec = TableSpec("t", Seq("pk"), Seq("c1"), Seq("v1", "v2"))
    val casTok = (cols: Seq[org.apache.spark.sql.Column]) =>
      CassandraMurmur3.tokenColumn(cols)
    val stats = DiffEngine.rangeStats(t, t, spec, DiffOptions(), casTok).collect()(0)
    assert(stats.getAs[Long]("matched_partitions") === 2)
    // token distribution sanity: distinct tokens per distinct pk
    val toks = DiffEngine.keyScan(t, spec, casTok).select("token").as[Long].collect()
    assert(toks.distinct.length === 2)
  }
}
