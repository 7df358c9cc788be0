package graft

import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, TableSpec}
import graft.engine.DiffEngine
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed snapshots diff without a join-side Exchange") {
    val spec = TableSpec("bt", Seq("pk"), Seq("c1"), Seq("v1"), uniqueKey = true)
    val src = (1L to 1000L).map(i => (i, 1, s"v$i")).toDF("pk", "c1", "v1")
    val tgt = src.withColumn("v1",
      when(col("pk") % 10 === 0, lit("changed")).otherwise(col("v1")))
    // clean any previous run's table + location (warehouse dir persists
    // across JVMs while the in-memory catalog does not)
    Seq("bspec_src", "bspec_tgt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(src, "bspec_src", Seq("pk", "c1"), 4)
    Bucketing.writeBucketed(tgt, "bspec_tgt", Seq("pk", "c1"), 4)
    val bs = Bucketing.readBucketed(spark, "bspec_src")
    val bt = Bucketing.readBucketed(spark, "bspec_tgt")

    val rl = DiffEngine.rowLevel(bs, bt, spec)
    val plan = rl.queryExecution.executedPlan.toString
    // co-located bucketed join: no shuffle before the sort-merge join
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

    val stats = DiffEngine.rangeStats(bs, bt, spec, DiffOptions(),
      DiffEngine.identityToken).collect()(0)
    assert(stats.getAs[Long]("mismatched_partitions") === 100)
    assert(stats.getAs[Long]("matched_partitions") === 900)
  }
}
