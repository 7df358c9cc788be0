package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{DiffJobConfig, DiffRunner, ResultsApi}
import graft.core.DiffOptions
import graft.engine.Perturb
import graft.journal.{MetadataStore, Resume}
import graft.sources.{ParquetSource, SchemaOps, SourceProvider}

class JournalApiSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-meta").toString

  test("run lock: second acquire fails until released (LWT semantics)") {
    implicit val s: SparkSession = spark
    val store = new MetadataStore(tmpRoot())
    assert(store.acquireRunLock("job1"))
    assert(!store.acquireRunLock("job1"))
    assert(store.isRunning("job1"))
    store.releaseRunLock("job1")
    assert(store.acquireRunLock("job1"))
  }

  test("resume: done buckets skipped, in-progress watermarked, rerun ignores journal") {
    val work = (0L to 9L).map(t => (t, t % 2)).toDF("token", "bucket")
    val journal = Seq(
      (0L, Resume.StatusDone, Option.empty[Long]),
      (1L, Resume.StatusInProgress, Some(5L))).toDF("bucket", "status", "last_token")
    val pending = Resume.pending(work, journal).as[(Long, Long)].collect().toSet
    // bucket 0 done -> gone; bucket 1 keeps tokens > 5
    assert(pending === Set((7L, 1L), (9L, 1L)))
    assert(Resume.pending(work, journal, rerun = true).count() === 10)
  }

  test("DiffRunner end-to-end: journals stats, mismatches and results; hooks fire") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val tgt = new SourceProvider { // perturbed view of the same corpus
      def table(sp: SparkSession, name: String): DataFrame =
        Perturb.lineitemTarget(src.table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    var pre = false; var post = Option.empty[Long]
    val results = new DiffRunner(src, tgt,
      DiffJobConfig("job-e2e", Seq(Perturb.lineitemSpec),
        DiffOptions(buckets = 8), metadataRoot = root))
      .addPreJobHook(() => pre = true)
      .addPostJobHook(r => post = Some(r("lineitem").mismatchedPartitions))
      .run()
    assert(pre)
    val stats = results("lineitem")
    assert(post.contains(stats.mismatchedPartitions))
    assert(stats.matchedPartitions > 0)
    assert(stats.onlyInSource > 0 && stats.onlyInTarget > 0)
    // journal written and queryable through the ResultsApi
    val store = new MetadataStore(root)
    val api = new ResultsApi(store)
    assert(api.jobResults("job-e2e").count() === 1)
    assert(api.mismatchSummary("job-e2e").count() === 3) // 3 mismatch types
    assert(api.jobStatus("job-e2e").count() === 8)       // one row per bucket
    assert(!store.isRunning("job-e2e"))                  // lock released
    // job_summary-backed endpoints (the reference's index-table queries)
    assert(api.job("job-e2e").count() === 1)
    assert(api.recentJobs().count() === 1)
    assert(api.jobsByKeyspace("lineitem").count() === 1)
    assert(api.jobsByKeyspace("nope").count() === 0)
    assert(api.jobsBySourceCluster("ParquetSource").count() === 1)
    assert(api.jobsByStartDate("2000-01-01", "2999-01-01").count() === 1)
    assert(api.jobMismatches("job-e2e").count() > 0)
    assert(api.runningJobs().count() === 0)
    // errors journal exists (clean corpus => zero rows) and is queryable
    assert(api.jobErrors("job-e2e").count() === 0)
    assert(api.errorSummary("job-e2e").count() === 0)
    assert(api.errorRanges("job-e2e").count() === 0)
    // metrics parity (Differ.updateMetrics): per-table accumulator series
    def metric(name: String) =
      graft.api.DiffMetrics.accumulator(spark, s"graft.lineitem.$name").value
    assert(metric("matched_partitions") === stats.matchedPartitions)
    assert(metric("mismatched_partitions") === stats.mismatchedPartitions)
    assert(metric("matched_values") === stats.matchedValues)
    assert(metric("partitions_read") === stats.matchedPartitions +
      stats.mismatchedPartitions + stats.onlyInSource + stats.onlyInTarget)
  }

  test("re-running a finished job id resumes to nothing; rerun=true re-compares") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val mkConfig = (rerun: Boolean) => DiffJobConfig("resume-job",
      Seq(Perturb.ordersSpec), DiffOptions(buckets = 4),
      metadataRoot = root, rerun = rerun)
    val first = new DiffRunner(src, src, mkConfig(false)).run()("orders")
    assert(first.matchedPartitions > 0)
    // all 4 buckets journaled done -> a plain re-run does no new work but
    // still reports the WHOLE job's totals from the journal
    val store = new MetadataStore(root)
    val statusRowsAfterFirst = store.read("task_status").count()
    val second = new DiffRunner(src, src, mkConfig(false)).run()("orders")
    assert(second === first)
    assert(store.read("task_status").count() === statusRowsAfterFirst) // no new buckets
    // rerun=true ignores the journal and re-compares everything
    val third = new DiffRunner(src, src, mkConfig(true)).run()("orders")
    assert(third.matchedPartitions === first.matchedPartitions)
    // after the rerun the journal holds TWO rows per bucket; a plain
    // resume must take the latest row per bucket, not join data rows
    // against both (which would duplicate input rows into the diff)
    val fourth = new DiffRunner(src, src, mkConfig(false)).run()("orders")
    assert(fourth === first)
    // append-only journal + latest-run dedupe: the API still serves ONE
    // row per table / bucket
    val api = new ResultsApi(store)
    assert(api.jobResults("resume-job").count() === 1)
    assert(api.jobStatus("resume-job").count() === 4)
  }

  test("incremental run re-diffs only digest-changed buckets and replays the rest") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    def tgtOf(f: DataFrame => DataFrame) = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame = f(src.table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    val buckets = 64
    val mk = (root2: String) => DiffJobConfig("inc-job", Seq(Perturb.lineitemSpec),
      DiffOptions(buckets = buckets), metadataRoot = root2, incremental = true)
    // run 1: "yesterday" — stale target (no cell mutations yet)
    new DiffRunner(src, tgtOf(Perturb.lineitemTargetStale), mk(root)).run()
    val store = new MetadataStore(root)
    val bucketsRun1 = store.read("task_status").select("bucket").distinct().count()
    // run 2: "today" — the cell mutations landed; only their buckets re-diff
    val inc = new DiffRunner(src, tgtOf(Perturb.lineitemTarget), mk(root))
      .run()("lineitem")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("run_ts").desc)
    val runTss = store.read("task_status").select("run_ts").distinct().count()
    assert(runTss === 2, "expected two journaled runs")
    val secondRunBuckets = store.read("task_status")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .groupBy("run_ts").count().orderBy(col("run_ts").desc)
      .select("count").as[Long].collect()
    // the fixture must be non-vacuous: run 2 re-diffed SOME buckets but
    // not all of them (the rest replay from run 1's journal rows)
    assert(secondRunBuckets(0) > 0 && secondRunBuckets(0) < bucketsRun1,
      s"run2 wrote ${secondRunBuckets(0)} of $bucketsRun1 buckets")
    // totals must equal a from-scratch full diff of the current pair
    val fullRoot = tmpRoot()
    val full = new DiffRunner(src, tgtOf(Perturb.lineitemTarget),
      DiffJobConfig("full-job", Seq(Perturb.lineitemSpec),
        DiffOptions(buckets = buckets), metadataRoot = fullRoot)).run()("lineitem")
    assert(inc === full)
    // the deduped mismatch view equals the full job's mismatch set
    val incSet = new ResultsApi(store).jobMismatches("inc-job")
      .select("token", "mismatch_type").as[(Long, String)].collect().toSet
    val fullSet = new ResultsApi(new MetadataStore(fullRoot))
      .jobMismatches("full-job")
      .select("token", "mismatch_type").as[(Long, String)].collect().toSet
    assert(incSet === fullSet && incSet.nonEmpty)
    // run 3: most partitions vanish from BOTH sides, emptying most
    // buckets entirely — retired buckets must get zero journal rows, not
    // replay run 2's counters forever
    def shrink(df: DataFrame): DataFrame = df.filter(col("l_orderkey") < 100)
    val srcShrunk = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame =
        shrink(src.table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    val shrunkTgt = tgtOf(d => Perturb.lineitemTarget(shrink(d)))
    val incShrunk = new DiffRunner(srcShrunk, shrunkTgt, mk(root)).run()("lineitem")
    val fullShrunk = new DiffRunner(srcShrunk, shrunkTgt,
      DiffJobConfig("full-shrunk", Seq(Perturb.lineitemSpec),
        DiffOptions(buckets = buckets), metadataRoot = tmpRoot())).run()("lineitem")
    assert(incShrunk === fullShrunk)
    // retirement really happened: the latest journal rows include
    // zeroed-out buckets
    val latest3 = store.read("task_status")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val zeroed = latest3.filter(
      col("matched_partitions") + col("mismatched_partitions") +
        col("only_in_source") + col("only_in_target") === 0).count()
    assert(zeroed > 0, "expected retired buckets with zero rows")
  }

  test("mismatch reads: latest classification wins per (job, table, bucket, token)") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val store = new MetadataStore(root)
    // reference PK ((job_id, bucket), table, token): mismatch_type is a
    // VALUE — re-recording a token upserts, latest classification wins
    store.write("mismatches", Seq(
      ("t1", 1L, 42L, "PARTITION_MISMATCH", "j1", 1000L),
      ("t1", 1L, 42L, "ONLY_IN_SOURCE", "j1", 2000L),
      ("t1", 1L, 43L, "ONLY_IN_TARGET", "j1", 1000L))
      .toDF("table_name", "bucket", "token", "mismatch_type", "job_id", "run_ts"),
      partitionBy = Seq("job_id"))
    val got = new ResultsApi(store).jobMismatches("j1")
      .select("token", "mismatch_type").as[(Long, String)].collect().toSet
    assert(got === Set((42L, "ONLY_IN_SOURCE"), (43L, "ONLY_IN_TARGET")))
  }

  test("re-run keeps the stored bucket count (params immutability)") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    new DiffRunner(src, src, DiffJobConfig("params-job", Seq(Perturb.ordersSpec),
      DiffOptions(buckets = 4), metadataRoot = root)).run()
    // second run configured with 99 buckets must keep the stored 4
    new DiffRunner(src, src, DiffJobConfig("params-job", Seq(Perturb.ordersSpec),
      DiffOptions(buckets = 99), metadataRoot = root, rerun = true)).run()
    val store = new MetadataStore(root)
    val buckets = store.read("task_status")
      .filter(col("job_id") === "params-job")
      .select("bucket").distinct().count()
    assert(buckets === 4)
  }

  test("re-run keeps ALL stored params: filters, sampling, table list") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val first = new DiffRunner(src, src,
      DiffJobConfig("params-full", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4), metadataRoot = root)).run()("orders")
    // re-run with conflicting sampling + token filters + an extra table:
    // the stored params must win or the journal's semantics silently change
    val rerun = new DiffRunner(src, src,
      DiffJobConfig("params-full", Seq(Perturb.ordersSpec, Perturb.lineitemSpec),
        DiffOptions(buckets = 99, samplingNum = 1, samplingDen = 1000,
          disallowedTokens = Seq(1L, 2L, 3L)),
        metadataRoot = root, rerun = true)).run()
    assert(!rerun.contains("lineitem")) // table not in the stored job
    assert(rerun("orders") === first)   // same scope ⇒ identical stats
  }

  test("re-run restores the FULL stored table set — omitted tables still diffed") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val first = new DiffRunner(src, src,
      DiffJobConfig("stored-set", Seq(Perturb.ordersSpec, Perturb.lineitemSpec),
        DiffOptions(buckets = 4), metadataRoot = root)).run()
    assert(first.keySet === Set("orders", "lineitem"))
    // a re-run submitted WITHOUT lineitem must still diff it: column roles
    // are reconstructed from the table_params journal, so the stored set
    // wins outright (reference params immutability, JobMetadataDb.java:432-490)
    val rerun = new DiffRunner(src, src,
      DiffJobConfig("stored-set", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4), metadataRoot = root, rerun = true)).run()
    assert(rerun.keySet === Set("orders", "lineitem"))
    assert(rerun("lineitem") === first("lineitem"))
    assert(rerun("orders") === first("orders"))
  }

  test("journal appends publish atomically: stale staging invisible, appends exact") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val store = new MetadataStore(root)
    store.write("probe", Seq((1L, "a")).toDF("x", "y"))
    // a crashed attempt's leftover `.staging-*` dir must never be read
    // back as journal rows (hidden dirs are outside Spark's file index)
    Seq((99L, "dead")).toDF("x", "y").write
      .parquet(java.nio.file.Paths.get(root, "probe", ".staging-dead").toString)
    assert(store.read("probe").count() === 1)
    // a second append lands NEXT TO the first (publish must not overwrite)
    store.write("probe", Seq((2L, "b")).toDF("x", "y"))
    assert(store.read("probe").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // partitioned appends keep their job_id directory layout through the
    // staging rename, so per-job filters still prune at directory level
    store.write("bypart", Seq((1L, "j1")).toDF("v", "job_id"),
      partitionBy = Seq("job_id"))
    store.write("bypart", Seq((2L, "j2"), (3L, "j1")).toDF("v", "job_id"),
      partitionBy = Seq("job_id"))
    assert(Files.exists(java.nio.file.Paths.get(root, "bypart", "job_id=j1")))
    assert(Files.exists(java.nio.file.Paths.get(root, "bypart", "job_id=j2")))
    assert(store.read("bypart").filter(col("job_id") === "j1").count() === 2)
    assert(store.read("bypart").count() === 3)
  }

  test("fully-matched job: every journal table reads back, empties included") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    // identical sides + reverse validation on: mismatches AND
    // reverse_checks are both EMPTY partitioned sinks — they must still
    // come back as readable (zero-row) datasets, not schema-inference
    // failures
    new DiffRunner(src, src,
      DiffJobConfig("clean-job", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4, reverseReadProbability = 1.0),
        metadataRoot = root)).run()
    val store = new MetadataStore(root)
    for (t <- Seq("job_summary", "task_status", "mismatches",
        "reverse_checks", "errors", "job_results"))
      assert(store.exists(t), t)
    assert(store.read("mismatches").filter(col("job_id") === "clean-job").count() === 0)
    assert(store.read("reverse_checks").count() === 0)
    val api = new ResultsApi(store)
    assert(api.jobMismatches("clean-job").count() === 0)
    assert(api.mismatchSummary("clean-job").count() === 0)
    assert(api.jobResults("clean-job").count() === 1)
    // a later job with real mismatches appends fine after the empty marker
    val tgt = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame =
        Perturb.lineitemTarget(ParquetSource(Sf).table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    new DiffRunner(src, tgt,
      DiffJobConfig("dirty-job", Seq(Perturb.lineitemSpec),
        DiffOptions(buckets = 4), metadataRoot = root)).run()
    assert(store.read("mismatches").filter(col("job_id") === "dirty-job").count() > 0)
    assert(store.read("mismatches").filter(col("job_id") === "clean-job").count() === 0)
  }

  test("repair=true journals the reconciliation script, served by the API") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val tgt = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame =
        Perturb.lineitemTarget(ParquetSource(Sf).table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    new DiffRunner(src, tgt,
      DiffJobConfig("repair-job", Seq(Perturb.lineitemSpec),
        DiffOptions(buckets = 4), metadataRoot = root, repair = true)).run()
    val api = new ResultsApi(new MetadataStore(root))
    val script = api.jobRepair("repair-job", Some("lineitem")).collect()
    assert(script.nonEmpty)
    // the standard perturbation exercises every repair class
    assert(script.map(_.getAs[String]("action")).toSet ===
      Set("INSERT", "UPDATE", "DELETE"))
    // the journaled script is EXACTLY what the standalone generator emits
    // for the same table pair — the runner adds reachability, not variance
    val standalone = graft.engine.Repair.repairStatements(
        src.table(spark, "lineitem"), tgt.table(spark, "lineitem"),
        Perturb.lineitemSpec)
      .select("statement").as[String].collect().sorted.toSeq
    assert(script.map(_.getAs[String]("statement")).sorted.toSeq === standalone)
    // table filter and unfiltered form agree; unknown table serves empty
    assert(api.jobRepair("repair-job").count() === script.length)
    assert(api.jobRepair("repair-job", Some("nope")).count() === 0)
    // a journal with no repair dataset serves an empty script, not a throw
    val root2 = tmpRoot()
    new DiffRunner(src, src, DiffJobConfig("norepair", Seq(Perturb.ordersSpec),
      DiffOptions(buckets = 4), metadataRoot = root2)).run()
    assert(new ResultsApi(new MetadataStore(root2)).jobRepair("norepair").count() === 0)
  }

  test("param restore tolerates a job_summary written by an older schema") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val store = new MetadataStore(root)
    // an older engine version journaled fewer columns: restore must use
    // what is stored (buckets=4) and fall back to config for the rest
    store.write("job_summary",
      Seq(("old-job", Seq("orders"), 4, "xxhash64", "2024-01-01T00:00:00.000Z"))
        .toDF("job_id", "keyspaces", "buckets", "partitioner", "start_time"))
    val src = ParquetSource(Sf)
    val stats = new DiffRunner(src, src,
      DiffJobConfig("old-job", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 99), metadataRoot = root)).run()("orders")
    assert(stats.matchedPartitions > 0)
    assert(store.read("task_status").filter(col("job_id") === "old-job")
      .select("bucket").distinct().count() === 4) // stored value wins
  }

  test("reverse-read validation pass journals verdict disagreements") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    // unequal duplicate-full-PK counts: forward pairing matches values,
    // reverse pairing mismatches them — the one genuinely order-sensitive
    // diff outcome; the validation pass must journal it
    val spec = graft.core.TableSpec("t", Seq("pk"), Seq("ck"), Seq("v"))
    val srcDf = Seq((1L, 1, 10), (1L, 1, 20), (1L, 1, 30)).toDF("pk", "ck", "v")
    val tgtDf = Seq((1L, 1, 10), (1L, 1, 20)).toDF("pk", "ck", "v")
    def provider(df: DataFrame) = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame = df
      def listTables(sp: SparkSession): Seq[String] = Seq("t")
    }
    new DiffRunner(provider(srcDf), provider(tgtDf),
      DiffJobConfig("rev-job", Seq(spec),
        DiffOptions(buckets = 4, reverseReadProbability = 1.0),
        metadataRoot = root)).run()
    val store = new MetadataStore(root)
    val checks = store.read("reverse_checks")
      .filter(col("job_id") === "rev-job").collect()
    assert(checks.length === 1)
    // counters disagree but both passes classify it a mismatch
    assert(checks(0).getAs[String]("fwd_classification") ===
      checks(0).getAs[String]("rev_classification"))
  }

  test("job lifecycle runs on RandomPartitioner tokens end-to-end") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val src = ParquetSource(Sf)
    val stats = new DiffRunner(src, src,
      DiffJobConfig("random-job", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4), metadataRoot = root,
        partitioner = "random")).run()("orders")
    // token choice cannot change the verdict counters
    val base = new DiffRunner(src, src,
      DiffJobConfig("xxh-job", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4), metadataRoot = tmpRoot())).run()("orders")
    assert(stats === base)
    // the journal carries the 127-bit tokens as 39-char decimal strings
    val store = new MetadataStore(root)
    val lastTokens = store.read("task_status")
      .filter(col("job_id") === "random-job")
      .select("last_token").as[String].collect()
    assert(lastTokens.nonEmpty)
    lastTokens.foreach(t => assert(t.length === 39 && t.forall(_.isDigit), t))
    // resume: a second run of the finished job does no new bucket work
    val rowsAfterFirst = store.read("task_status")
      .filter(col("job_id") === "random-job").count()
    new DiffRunner(src, src,
      DiffJobConfig("random-job", Seq(Perturb.ordersSpec),
        DiffOptions(buckets = 4), metadataRoot = root,
        partitioner = "random")).run()
    assert(store.read("task_status")
      .filter(col("job_id") === "random-job").count() === rowsAfterFirst)
  }

  test("concurrent run of the same job id is refused") {
    implicit val s: SparkSession = spark
    val root = tmpRoot()
    val store = new MetadataStore(root)
    store.acquireRunLock("busy")
    val src = ParquetSource(Sf)
    val runner = new DiffRunner(src, src,
      DiffJobConfig("busy", Seq(Perturb.ordersSpec), metadataRoot = root))
    assertThrows[IllegalArgumentException](runner.run())
  }

  test("schema ops: intersect drops disallowed + asymmetric; difference reports both sides") {
    val a = Seq("t1", "t2", "t3", "sys")
    val b = Seq("t2", "t3", "t4", "sys")
    assert(SchemaOps.intersect(a, b, Set("sys")) === Seq("t2", "t3"))
    assert(SchemaOps.difference(a, b) === Seq("t1", "t4"))
  }

  test("digestFirst: identical sides skip the wide join; perturbed results identical") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    implicit val s: SparkSession = spark
    val src = ParquetSource(Sf)
    val n = src.table(spark, "lineitem").count()

    final class ShuffleRecords extends SparkListener {
      val records = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          records.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def settled(l: ShuffleRecords): Long = {
      // listener events are delivered async; poll until the counter stops
      var prev = -1L
      var cur = l.records.get
      var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(200); cur = l.records.get; spins += 1
      }
      cur
    }
    def run(job: String, digest: Boolean,
        tgt: SourceProvider): (graft.core.RangeStats, Long) = {
      val l = new ShuffleRecords
      spark.sparkContext.addSparkListener(l)
      try {
        val stats = new DiffRunner(src, tgt,
          DiffJobConfig(job, Seq(Perturb.lineitemSpec),
            DiffOptions(buckets = 8), metadataRoot = tmpRoot(),
            digestFirst = digest)).run()("lineitem")
        (stats, settled(l))
      } finally spark.sparkContext.removeSparkListener(l)
    }

    // identical sides: every bucket digest-matches, so the wide full-PK
    // join gets ZERO input rows — the digest pass ships one narrow row
    // per PARTITION (the distinct-pk partial aggregate), never per data
    // row, so total shuffle records stay ≈ partitions + journal overhead
    // instead of ≥ 2n data rows
    val parts = src.table(spark, "lineitem").select("l_orderkey")
      .distinct().count()
    val (same, digestRecords) = run("df-same", digest = true, src)
    assert(same.mismatchedPartitions === 0 && same.onlyInSource === 0 &&
      same.onlyInTarget === 0 && same.mismatchedValues === 0)
    assert(same.matchedRows === n)
    assert(digestRecords < parts + 500,
      s"digest-first run shuffled $digestRecords records (n=$n, parts=$parts) — data rows reached the wide join")
    val (_, plainRecords) = run("df-plain", digest = false, src)
    assert(plainRecords > n,
      s"plain run shuffled only $plainRecords records (n=$n) — listener not capturing?")

    // perturbed pair: digest-first totals must be bit-identical to the
    // plain path (dirty buckets re-run the full diff, clean buckets are
    // arithmetic)
    val tgt = new SourceProvider {
      def table(sp: SparkSession, name: String): DataFrame =
        Perturb.lineitemTarget(src.table(sp, name))
      def listTables(sp: SparkSession): Seq[String] = src.listTables(sp)
    }
    val (a, _) = run("df-pert-digest", digest = true, tgt)
    val (b, _) = run("df-pert-plain", digest = false, tgt)
    assert(a === b)
    assert(a.mismatchedPartitions > 0 && a.onlyInSource > 0)
  }
}
