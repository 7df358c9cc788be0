package graft

import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, TableSpec}
import graft.engine.DiffEngine
import graft.functions.{CassandraMurmur3, CassandraRandomPartitioner => RP}

class CassandraRandomTokenSpec extends SparkSpec {
  import spark.implicits._

  // Known vectors computed with an INDEPENDENT implementation (python
  // hashlib.md5 + signed big-endian int interpretation + abs), matching
  // Cassandra's FBUtilities.hashToBigInteger semantics.
  private val Vectors: Seq[(Array[Byte], String)] = Seq(
    "foo".getBytes("UTF-8") ->
      "110673303387115207421586718101067225896",
    "42".getBytes("UTF-8") ->
      "125192627535456020161520385178266216282",
    "1".getBytes("UTF-8") ->
      "078703492656118554854272571946195123045",
    "hello world".getBytes("UTF-8") ->
      "125893641179230474042701625388361764291",
    CassandraMurmur3.serializeLong(42L) ->
      "167509774581059482115122350544966522260",
    CassandraMurmur3.serializeInt(7) ->
      "137731376325982006772573399291321493164",
    CassandraMurmur3.composite(
      Array(CassandraMurmur3.serializeLong(42L), "foo".getBytes("UTF-8"))) ->
      "155141665525717409862196786346973836589",
    Array.empty[Byte] ->
      "058332598431525814501020785164969033090")

  test("matches independently-computed RandomPartitioner vectors") {
    Vectors.foreach { case (bytes, want) =>
      assert(RP.token(bytes).toString === want, s"key len ${bytes.length}")
    }
  }

  test("tokens are fixed-width and order like the BigIntegers they encode") {
    val toks = (0 until 500).map(i => RP.token(s"key$i".getBytes).toString)
    toks.foreach(t => assert(t.length === RP.TokenDigits))
    val byString = toks.sorted
    val byNumber = toks.sortBy(BigInt(_))
    assert(byString === byNumber)
    // all within the RandomPartitioner range
    toks.foreach(t => assert(BigInt(t) >= 0 && BigInt(t) <= (BigInt(1) << 127)))
  }

  test("column expression: string pk tokens match scalar impl; null-safe") {
    val df = Seq(Some("foo"), Some("42"), None).toDF("pk")
    val got = df.select(RP.tokenColumn(Seq(col("pk"))).as("t"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(got(0).contains("110673303387115207421586718101067225896"))
    assert(got(1).contains("125192627535456020161520385178266216282"))
    assert(got(2).isEmpty)
  }

  test("token expression survives CODEGEN_ONLY (single and composite keys)") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val df = Seq((42L, "foo", Some(3)), (8L, "y", None)).toDF("a", "b", "c")
      val rows = df.select(
        RP.tokenColumn(Seq(col("a"))).as("single"),
        RP.tokenColumn(Seq(col("a"), col("b"))).as("composite"),
        RP.tokenColumn(Seq(col("a"), col("c"))).as("with_null"))
        .collect()
      assert(rows(0).getString(0) === "167509774581059482115122350544966522260")
      assert(rows(0).getString(1) === "155141665525717409862196786346973836589")
      assert(!rows(0).isNullAt(2) && rows(1).isNullAt(2))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("registered as a SQL function via GraftExtensions") {
    val got = spark.sql("SELECT cassandra_random_token('foo') AS t").collect()(0).getString(0)
    assert(got === "110673303387115207421586718101067225896")
  }

  test("plugs into DiffEngine as the token function") {
    val t = Seq((1L, 1, "a", 10), (2L, 1, "b", 20)).toDF("pk", "c1", "v1", "v2")
    val spec = TableSpec("t", Seq("pk"), Seq("c1"), Seq("v1", "v2"))
    val tok = (cols: Seq[org.apache.spark.sql.Column]) => RP.tokenColumn(cols)
    val stats = DiffEngine.rangeStats(t, t, spec, DiffOptions(), tok).collect()(0)
    assert(stats.getAs[Long]("matched_partitions") === 2)
    val toks = DiffEngine.keyScan(t, spec, tok).select("token").as[String].collect()
    assert(toks.distinct.length === 2)
    toks.foreach(t => assert(t.length === RP.TokenDigits))
  }
}
