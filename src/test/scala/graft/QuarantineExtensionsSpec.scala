package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, TableSpec}
import graft.engine.{DiffEngine, Quarantine}

class QuarantineExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val spec = TableSpec("t", Seq("pk"), Seq("c1"), Seq("v1"))

  test("quarantine diverts null-pk rows; diff runs on the clean remainder") {
    val src = Seq((Some(1L), 1, "a"), (None, 1, "bad"), (Some(2L), 1, "b"))
      .toDF("pk", "c1", "v1")
    val s = Quarantine.split(src, spec, "source")
    assert(s.errors.count() === 1)
    val err = s.errors.collect()(0)
    assert(err.getAs[String]("origin") === "source")
    assert(err.getAs[String]("error") === "null_pk_pk")
    assert(err.getAs[String]("pk") === "∅")
    val clean = Seq((1L, 1, "a"), (2L, 1, "b")).toDF("pk", "c1", "v1")
    val stats = DiffEngine.rangeStats(s.valid, clean, spec, DiffOptions(),
      DiffEngine.identityToken).collect()(0)
    assert(stats.getAs[Long]("matched_partitions") === 2)
    assert(stats.getAs[Long]("mismatched_partitions") === 0)
  }

  test("custom checks chain with first-failing reason") {
    val df = Seq((1L, -5, "x"), (2L, 3, "ok")).toDF("pk", "c1", "v1")
    val s = Quarantine.split(df, spec, "target",
      checks = Seq("negative_c1" -> (col("c1") < 0)))
    assert(s.errors.count() === 1)
    assert(s.errors.collect()(0).getAs[String]("error") === "negative_c1")
    assert(s.valid.count() === 1)
  }

  test("extensions register SQL functions (session built with GraftExtensions)") {
    // the shared test session enables spark.sql.extensions=graft.GraftExtensions
    val tok = spark.sql("SELECT cassandra_murmur3_token(CAST(7 AS BIGINT)) AS t")
      .collect()(0).getLong(0)
    assert(tok === graft.functions.CassandraMurmur3.token(
      graft.functions.CassandraMurmur3.serializeLong(7L)))
    val dot = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), " +
        "array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)
  }
}
