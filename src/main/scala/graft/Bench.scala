package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution-footprint accounting: total shuffle bytes and spill across
  * the bench — the scale-relevant signal (a fast-but-shuffle-heavy plan
  * stops being fast at 1000 executors).
  */
private final class FootprintListener extends SparkListener {
  val shuffleRead = new java.util.concurrent.atomic.AtomicLong
  val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
  val spill = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
    }
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // default: one shuffle partition per core (right for the sf0.1
      // gate); SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for scale-shape
      // runs where partitions must be sized to the data, not the box
      // (the r13 100x audit spilled 83.5 GB under the sf0.1-tuned
      // default — the knob, not the plan)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // let the diff join reuse the occurrence-window's (pk, ck) hash
      // partitioning — a subset of the join keys (pk, ck, __occ) — instead
      // of re-shuffling the full data on all three (saves one full-data
      // exchange per side on the hottest path)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // shuffle/spill to tmpfs: the VM's virtio block device turns the
      // many small shuffle files into sys-time (observed 80% idle/16% sys)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // this VM exhibits intermittent single-task stalls (one task at 50%
      // cpu for minutes while the rest park); speculation re-launches
      // stragglers — same defense a real cluster needs for sick executors
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "1s")
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.9")
      .getOrCreate()
    // SPARK_GRAFT_LOG_LEVEL=INFO surfaces the codegen-fallback notices
    // ("Found too long generated codes…" logs at INFO) for plan audits;
    // default WARN keeps the bench line readable
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "WARN"))
    val footprint = new FootprintListener
    spark.sparkContext.addSparkListener(footprint)
    // Each query runs SPARK_GRAFT_REPEAT times and reports the fastest —
    // steady-state measurement (JIT + page cache warm), which is what a
    // long-running cluster job actually sees. Default 5: this VM shows
    // intermittent multi-second single-task stalls; with ~40 queries a
    // stall lands on ALL of a query's repeats often enough at min-of-3
    // that some query is inflated nearly every run (observed 25% total
    // swing), while min-of-5 makes that rare for ~2 min extra bench time.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "5").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // untimed warm-up: exercise codegen/JIT/parquet-footer paths once so
    // measured times reflect the engine, not first-query JVM warm-up
    // Force queries through the V2 noop sink, NOT count(): count() lets
    // Catalyst prune every computed column the count doesn't need and
    // eliminate unique-key left joins outright, so wide-output operators
    // (reassembled clean_text, redacted strings, resized payloads) were
    // timed as little more than their scans — the 100× audit exposed
    // dedup_exact_substr "running" 500k docs faster than 5k. The noop
    // write materializes every row and column (what Verify's parquet
    // dump and any real consumer pays) with zero I/O.
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try {
      SparkEntry.queries.get("q1_agg").foreach(q => force(q(spark, sfDir)))
      SparkEntry.queries.get("diff_range_stats").foreach(q => force(q(spark, sfDir)))
    } catch { case _: Throwable => () }
    // Full untimed warm-up pass (SPARK_GRAFT_WARMUP=0 to skip): run every
    // selected query once before any timing, so each query's codegen
    // compile, parquet footer reads, and JIT tiers are paid OUTSIDE the
    // measured repeats. The driver's single-invocation run is the number
    // of record; without this, a cold first repeat plus this VM's
    // intermittent task stalls put tail queries 2-10x above the archived
    // min-of-N floors (r13 VERDICT task #4).
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      selected.foreach { case (_, fn) =>
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    // A repeat that throws yields NO time — a broken query must never
    // surface as a (fast) timing row. Queries with zero successful repeats
    // go in a separate "failed" key, excluded from "queries" and "value"
    // (round 7 shipped 8 time-to-throw entries as the "fastest" queries).
    val runs = selected.map { case (name, fn) =>
      val times = (1 to repeat).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name threw: ${e.getMessage}"); false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      if (repeat > 1 && times.nonEmpty)
        System.err.println(s"[bench] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
      name -> times
    }
    val results = runs.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    val failed = runs.collect { case (n, ts) if ts.isEmpty => n }.toSeq
    // ms precision: 243 queries at full double precision made the one-line
    // JSON ~9 KB and the driver's stdout tail capture truncated its head —
    // PERF had parsed:null (no per-query comparison) for three straight
    // rounds. Sub-ms digits are far below this VM's run-to-run noise, so
    // nothing real is lost; the full-precision report still lands in
    // SPARK_GRAFT_BENCH_OUT below.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"""" +
        s""","shuffle_read_bytes":${footprint.shuffleRead.get}""" +
        s""","shuffle_write_bytes":${footprint.shuffleWrite.get}""" +
        s""","spilled_bytes":${footprint.spill.get}}"""
    println(json)
    // also persist the full report: stdout tails get truncated by log
    // capture, which has lost per-query times in past runs — the file is
    // the self-contained artifact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_report.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] report write failed: $e") }
    spark.stop()
  }
}
