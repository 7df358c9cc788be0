package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, RangeStats, TableSpec}
import graft.engine.DiffEngine
import graft.journal.{MetadataStore, Resume}
import graft.sources.SourceProvider

/** One diff job over a set of tables — the reference's programmatic entry
  * (`new DiffJob().run(config, sc)`, DiffJob.java:73-196) with the same
  * two hook points (`addPreJobHook` / `addPostJobHook`,
  * DiffJob.java:73-84).
  *
  * Lifecycle (mirrors SURVEY §3.1 steps 2-9, minus what Catalyst now owns):
  *  1. acquire the run lock (O21)
  *  2. per table: rangeStats + mismatches as ONE lazily-planned query each
  *  3. journal: task_status (bucket progress), mismatches, job_results
  *  4. release lock; post-hook gets the final per-table stats
  */
final case class DiffJobConfig(
    jobId: String,
    tables: Seq[TableSpec],
    options: DiffOptions = DiffOptions(),
    metadataRoot: String = "/tmp/graft-metadata",
    rerun: Boolean = false)

final class DiffRunner(
    source: SourceProvider,
    target: SourceProvider,
    config: DiffJobConfig)(implicit spark: SparkSession) {

  private var preJobHooks: List[() => Unit] = Nil
  private var postJobHooks: List[Map[String, RangeStats] => Unit] = Nil

  def addPreJobHook(f: () => Unit): DiffRunner = { preJobHooks ::= f; this }
  def addPostJobHook(f: Map[String, RangeStats] => Unit): DiffRunner = { postJobHooks ::= f; this }

  /** Run the whole job; returns final stats per table. */
  def run(): Map[String, RangeStats] = {
    val store = new MetadataStore(config.metadataRoot)
    require(store.acquireRunLock(config.jobId),
      s"job ${config.jobId} already running (running_jobs lock held)") // O21 LWT semantics
    try {
      preJobHooks.foreach(_())
      import spark.implicits._
      // O21 params immutability: a re-run of an existing job_id keeps the
      // stored bucket count regardless of the new config
      // (JobMetadataDb getJobParams, DiffJob.java:136-143, 213-229)
      val priorSummary =
        if (store.exists("job_summary"))
          store.read("job_summary").filter(col("job_id") === config.jobId)
            .collect().headOption
        else None
      val options = priorSummary match {
        case Some(row) => config.options.copy(buckets = row.getAs[Int]("buckets"))
        case None => config.options
      }
      if (priorSummary.isEmpty)
        // job_summary row: params + start metadata (JobMetadataDb.java:496-544;
        // the reference's by-date/by-cluster index tables become pushed-down
        // filters over these columns)
        store.write("job_summary", Seq((
          config.jobId,
          source.getClass.getSimpleName,
          target.getClass.getSimpleName,
          config.tables.map(_.table),
          options.buckets,
          java.time.Instant.now().toString)).toDF(
          "job_id", "source_cluster", "target_cluster", "keyspaces",
          "buckets", "start_time"))
      val results = config.tables.map { spec0 =>
        val spec = spec0.bind(source.table(spark, spec0.table))
        // O15: quarantine structurally invalid rows per side (origin
        // tagged), journal them, diff the clean remainder
        val sq = graft.engine.Quarantine.split(source.table(spark, spec.table), spec, "source")
        val tq = graft.engine.Quarantine.split(target.table(spark, spec.table), spec, "target")
        store.write("errors",
          sq.errors.unionByName(tq.errors)
            .withColumn("table_name", lit(spec.table))
            .withColumn("job_id", lit(config.jobId)))
        // O12 resume: completed buckets of a previous run of this job are
        // skipped (rerun=true re-compares them — Differ.java:166-171)
        val journal =
          if (store.exists("task_status"))
            store.read("task_status")
              .filter(col("job_id") === config.jobId && col("table_name") === spec.table)
              .select(col("bucket"), col("status"), col("last_token"))
          else spark.emptyDataFrame
        val resuming = journal.columns.nonEmpty && !journal.isEmpty
        def onlyPending(df: DataFrame): DataFrame =
          if (!resuming || config.rerun) df
          else {
            val keys = DiffEngine.keyScan(df, spec)
              .withColumn("bucket", DiffEngine.bucket(col("token"), options.buckets))
            df.join(Resume.pending(keys, journal, config.rerun)
              .select(spec.pk.map(col): _*), spec.pk, "left_semi")
          }
        val src = onlyPending(sq.valid)
        val tgt = onlyPending(tq.valid)
        // journal sinks (O13 progress, O14 mismatches)
        // partition journal datasets by job_id so every ResultsApi
        // endpoint's job filter prunes at the directory level
        store.write("task_status",
          DiffEngine.bucketProgress(src, tgt, spec, options)
            .withColumn("status", lit("done"))
            .withColumn("job_id", lit(config.jobId)),
          partitionBy = Seq("job_id"))
        store.write("mismatches",
          DiffEngine.mismatches(src, tgt, spec, options)
            .select("table_name", "bucket", "token", "mismatch_type")
            .withColumn("job_id", lit(config.jobId)),
          partitionBy = Seq("job_id"))
        val statsDf = DiffEngine.rangeStats(src, tgt, spec, options)
        store.writeResults(config.jobId, statsDf)
        val row = statsDf.collect()(0) // single aggregated row per table
        spec.table -> MetadataStore.toRangeStats(row)
      }.toMap
      postJobHooks.foreach(_(results))
      results
    } finally store.releaseRunLock(config.jobId)
  }
}
