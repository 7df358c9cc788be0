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
    rerun: Boolean = false,
    partitioner: String = "xxhash64",
    retry: graft.journal.RetryPolicy = graft.journal.RetryPolicy.NoRetry,
    // cross-RUN incremental mode: journal per-bucket side digests each
    // run; a later run of the same job_id re-diffs ONLY buckets whose
    // digests changed on either side — unchanged buckets keep their
    // journal rows (task_status latest-per-bucket totals and persisted
    // mismatch rows ARE the replay). Subsumes the resume filter.
    incremental: Boolean = false,
    // single-RUN digest prefilter: compare per-bucket digests of the two
    // sides first (a narrow ≤ buckets-row shuffle) and feed ONLY the
    // disagreeing buckets to the wide full-PK join; digest-equal buckets
    // journal their phase-1 arithmetic rows directly. On a
    // mostly-matching corpus the wide join shrinks to the dirty
    // fraction — the digestRangeStats shape, available from the
    // journaling entry point. Results are bit-identical either way.
    digestFirst: Boolean = false,
    // reconciliation output: journal a CQL repair script per table
    // (INSERT/UPDATE/DELETE treating the source as truth) alongside the
    // mismatch rows, served by ResultsApi.jobRepair. Costs one extra
    // row-level join per table when enabled.
    repair: Boolean = false,
    // per-table per-column ε tolerance: |src − tgt| <= ε counts matched
    // (float replica drift). Incompatible with digestFirst — digests
    // hash exact values, so a within-tolerance bucket would still read
    // dirty AND its diff rows would disagree with the digest verdict.
    tolerances: Map[String, Map[String, Double]] = Map.empty) {
  require(tolerances.isEmpty || !digestFirst,
    "tolerances are incompatible with digestFirst (digests hash exact values)")
}

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
    val store = new MetadataStore(config.metadataRoot, config.retry)
    require(store.acquireRunLock(config.jobId),
      s"job ${config.jobId} already running (running_jobs lock held)") // O21 LWT semantics
    try {
      preJobHooks.foreach(_())
      import spark.implicits._
      // O21 params immutability: a re-run of an existing job_id keeps ALL
      // stored job params — tables, token filters, sampling, reverse-read
      // probability, buckets — regardless of the new config, matching the
      // reference's getJobParams reuse (JobMetadataDb.java:432-490;
      // DiffJob.java:136-143, 213-229). A re-run with conflicting options
      // must not silently diverge from the journal's semantics.
      // mergeSchema + per-column fallback: a journal written by an older
      // engine version (fewer columns) must restore the params it HAS and
      // fall back to the submitted config for the rest, not throw on
      // fieldIndex of an absent column
      val priorSummary =
        if (store.exists("job_summary"))
          store.read("job_summary", mergeSchema = true)
            .filter(col("job_id") === config.jobId)
            .collect().headOption
        else None
      def restore[T](row: org.apache.spark.sql.Row, name: String, dflt: T): T =
        if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
          row.getAs[T](name)
        else dflt
      def restoreSeq[T](row: org.apache.spark.sql.Row, name: String,
          dflt: Seq[T]): Seq[T] =
        if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
          row.getSeq[T](row.fieldIndex(name)).toSeq
        else dflt
      val options = priorSummary match {
        case Some(row) => graft.core.DiffOptions(
          buckets = restore(row, "buckets", config.options.buckets),
          disallowedTokens = restoreSeq(row, "disallowed_tokens",
            config.options.disallowedTokens),
          specificTokens = restoreSeq(row, "specific_tokens",
            config.options.specificTokens),
          samplingNum = restore(row, "sampling_num", config.options.samplingNum),
          samplingDen = restore(row, "sampling_den", config.options.samplingDen),
          reverseReadProbability = restore(row, "reverse_read_probability",
            config.options.reverseReadProbability))
        case None => config.options
      }
      val tables = priorSummary match {
        case Some(row) =>
          // Params immutability covers the TABLE SET too: the reference
          // re-runs the full stored set regardless of what the new
          // submission lists (JobMetadataDb.java:432-490; DiffJob.java:
          // 136-143). Column roles are persisted per table in
          // `table_params`, so stored specs are reconstructed outright and
          // the stored set wins — a table omitted from the re-run config
          // is still diffed. Journals written before `table_params`
          // existed fall back to intersecting stored names with the
          // submitted specs (the only roles available).
          val storedSpecs =
            if (store.exists("table_params"))
              store.read("table_params", mergeSchema = true)
                .filter(col("job_id") === config.jobId)
                .collect().toSeq
            else Seq.empty
          if (storedSpecs.nonEmpty)
            storedSpecs.map(r => graft.core.TableSpec(
              table = r.getAs[String]("table_name"),
              pk = restoreSeq(r, "pk", Nil),
              clustering = restoreSeq(r, "clustering", Nil),
              regular = restoreSeq(r, "regular", Nil),
              uniqueKey = restore(r, "unique_key", false)))
              .sortBy(_.table)
          else {
            val stored = restoreSeq(row, "keyspaces",
              config.tables.map(_.table)).toSet
            config.tables.filter(t => stored(t.table))
          }
        case None => config.tables
      }
      val partitioner = priorSummary match {
        case Some(row) => restore(row, "partitioner", config.partitioner)
        case None => config.partitioner
      }
      val token = DiffEngine.tokenFunction(partitioner)
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
          options.disallowedTokens,
          options.specificTokens,
          options.samplingNum,
          options.samplingDen,
          options.reverseReadProbability,
          partitioner,
          // fixed-width render: lexicographic order == chronological
          // (Instant.toString varies fractional digits and breaks sorts)
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
            .withZone(java.time.ZoneOffset.UTC)
            .format(java.time.Instant.now()))).toDF(
          "job_id", "source_cluster", "target_cluster", "keyspaces",
          "buckets", "disallowed_tokens", "specific_tokens",
          "sampling_num", "sampling_den", "reverse_read_probability",
          "partitioner", "start_time"))
      if (priorSummary.isEmpty)
        // per-table column roles, so a re-run can reconstruct the stored
        // TableSpecs without trusting the resubmitted config (the
        // reference stores qualified table names and refetches roles from
        // cluster metadata, TableSpec.java:71-89; file sources have no
        // metadata service, so roles live in the journal)
        store.write("table_params", config.tables.map(t =>
            (config.jobId, t.table, t.pk, t.clustering, t.regular,
              t.uniqueKey))
          .toDF("job_id", "table_name", "pk", "clustering", "regular",
            "unique_key"))
      val results = tables.map { spec0 =>
        require(spec0.pk.nonEmpty,
          s"table ${spec0.table}: partition key columns must be declared")
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
          if (store.exists("task_status")) {
            // latest row per bucket: after a rerun the append-only journal
            // holds one row per bucket PER RUN, and feeding duplicates to
            // the per-row pending join would replicate input rows
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(col("bucket")).orderBy(col("run_ts").desc)
            store.read("task_status")
              .filter(col("job_id") === config.jobId && col("table_name") === spec.table)
              .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
              .select(col("bucket"), col("status"), col("last_token"))
          } else spark.emptyDataFrame
        val resuming = journal.columns.nonEmpty && !journal.isEmpty
        // The pending test is a pure per-row predicate of the key (token =
        // f(pk), bucket = pmod(token), journal lookup per bucket), so it is
        // applied directly to each side with a BROADCAST join against the
        // journal (≤ options.buckets rows) — the earlier key-scan +
        // semi-join shape scanned every input twice per side just to
        // rediscover values derivable row-by-row.
        def onlyPending(df: DataFrame): DataFrame =
          if (!resuming || config.rerun || config.incremental) df
          else {
            val keyed = df.withColumn("__token", token(spec.pk.map(col)))
            val bucketed = keyed.withColumn("__bucket",
              DiffEngine.bucketOf(keyed, options.buckets, tokenCol = "__token"))
            Resume.pending(bucketed, broadcast(journal), config.rerun,
                tokenCol = "__token", bucketCol = "__bucket")
              .drop("__token", "__bucket")
          }
        val fsrc = DiffEngine.applyTokenFilters(onlyPending(sq.valid), spec,
          options, token)
        val ftgt = DiffEngine.applyTokenFilters(onlyPending(tq.valid), spec,
          options, token)
        // Incremental mode: digest both sides at the journal-bucket
        // granularity (digest bucket rule == task_status bucket rule, so
        // the latest-per-bucket totals below replay unchanged buckets from
        // the previous run), restrict the diff to changed buckets, and
        // journal this run's digests for the next one. The unchanged set
        // is ≤ options.buckets longs — collected and re-broadcast rather
        // than left lazy so the digest pass runs exactly once.
        val curDigests =
          if (config.incremental)
            Some(DiffEngine.sideDigests(fsrc, ftgt, spec, options.buckets,
              token).persist())
          else None
        val priorDigests = curDigests.flatMap { _ =>
          if (!store.exists("bucket_digests")) None
          else {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(col("bucket")).orderBy(col("run_ts").desc)
            Some(store.read("bucket_digests", mergeSchema = true)
              .filter(col("job_id") === config.jobId &&
                col("table_name") === spec.table)
              .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1))
          }
        }
        val unchangedBuckets: Seq[Long] = (curDigests, priorDigests) match {
          case (Some(cur), Some(prior)) =>
            DiffEngine.unchangedDigestBuckets(cur, prior)
              .as[Long].collect().toSeq
          case _ => Nil
        }
        // RETIRED buckets: journaled last run, gone from both sides now.
        // They take the fresh path (no current rows ⇒ an empty diff), but
        // with no partitionStats rows they would never get a new journal
        // row and the latest-per-bucket totals would replay their stale
        // counters forever — so they get explicit zero rows below.
        val retiredBuckets: Seq[Long] = (curDigests, priorDigests) match {
          case (Some(cur), Some(prior)) =>
            prior.select("bucket").as[Long].collect().toSeq
              .diff(cur.select("bucket").as[Long].collect().toSeq)
          case _ => Nil
        }
        def changedOnly(df: DataFrame): DataFrame =
          if (unchangedBuckets.isEmpty) df
          else {
            val keyed = df.withColumn("__token", token(spec.pk.map(col)))
            val bucketed = keyed.withColumn("__bucket",
              DiffEngine.bucketOf(keyed, options.buckets, tokenCol = "__token"))
            bucketed.join(
                broadcast(unchangedBuckets.toDF("__same_bucket")),
                col("__bucket") === col("__same_bucket"), "left_anti")
              .drop("__token", "__bucket")
          }
        // digest-first fast path: persisted so its two consumers (the
        // dirty-set collect and the clean journal rows) run the narrow
        // digest aggregation once. The dirty set is ≤ options.buckets
        // longs — collected and re-broadcast like the incremental path's
        // unchanged set.
        val digestPre =
          if (config.digestFirst)
            Some(DiffEngine.digestProgress(changedOnly(fsrc),
              changedOnly(ftgt), spec, options.buckets, token).persist())
          else None
        val dirtySet: Seq[Long] = digestPre match {
          case Some(d) => d.filter(!col("digest_match"))
            .select(col("bucket").cast("long")).as[Long].collect().toSeq
          case None => Nil
        }
        def dirtyOnly(df: DataFrame): DataFrame = digestPre match {
          case None => df
          case Some(_) =>
            val keyed = df.withColumn("__token", token(spec.pk.map(col)))
            val bucketed = keyed.withColumn("__bucket",
              DiffEngine.bucketOf(keyed, options.buckets, tokenCol = "__token"))
            bucketed.join(broadcast(dirtySet.toDF("__dirty_bucket")),
                col("__bucket") === col("__dirty_bucket"), "left_semi")
              .drop("__token", "__bucket")
        }
        val src = dirtyOnly(changedOnly(fsrc))
        val tgt = dirtyOnly(changedOnly(ftgt))
        // ONE diff computation per table: persist the per-partition stats
        // and derive progress, mismatches and totals from it (without the
        // persist, each journal sink would re-run the join+agg)
        val ps = DiffEngine.partitionStats(src, tgt, spec, token,
          tolerances = config.tolerances.getOrElse(spec.table, Map.empty))
          .persist()
        try {
          val runTs = System.currentTimeMillis()
          // checkpoint ordering mirrors the reference (mismatches recorded
          // BEFORE a range is marked complete, RangeComparator.java:201-241):
          // a crash between the writes must re-compare, never lose records.
          // journal datasets are partitioned by job_id so per-job endpoint
          // filters prune at the directory level.
          store.write("mismatches",
            DiffEngine.mismatchesFromPartitions(ps, spec, options.buckets)
              .select("table_name", "bucket", "token", "mismatch_type")
              .withColumn("job_id", lit(config.jobId))
              .withColumn("run_ts", lit(runTs)),
            partitionBy = Seq("job_id"))
          // repair script: recorded with the mismatches (same
          // crash-safety rule — never after the range is marked done).
          // Normalized to (token, action, statement) so the journal
          // dataset has ONE schema across tables with different keys;
          // token is the same per-partition address the mismatch rows
          // carry, so an operator can join script rows to mismatch rows.
          if (config.repair)
            store.write("repair_scripts",
              graft.engine.Repair.repairStatements(src, tgt, spec)
                .withColumn("token", token(spec.pk.map(col)))
                .select(col("token"), col("action"), col("statement"))
                .withColumn("table_name", lit(spec.table))
                .withColumn("job_id", lit(config.jobId))
                .withColumn("run_ts", lit(runTs)),
              partitionBy = Seq("job_id"))
          // with digestFirst, ps covers only dirty buckets — clean
          // buckets journal their digest-derived arithmetic rows
          val progress = {
            val fromDiff =
              DiffEngine.bucketProgressFromPartitions(ps, spec, options.buckets)
            digestPre match {
              case Some(d) => fromDiff.unionByName(
                d.filter(col("digest_match")).drop("digest_match"))
              case None => fromDiff
            }
          }
          store.write("task_status", progress
              .withColumn("status", lit("done"))
              .withColumn("job_id", lit(config.jobId))
              .withColumn("run_ts", lit(runTs)),
            partitionBy = Seq("job_id"))
          // retired buckets (journaled before, empty on both sides now)
          // get explicit zero rows so the latest-per-bucket totals stop
          // replaying their stale counters
          if (retiredBuckets.nonEmpty) {
            val tokenType = fsrc
              .select(token(spec.pk.map(col)).as("__t")).schema("__t").dataType
            var zero = retiredBuckets.toDF("bucket")
            Seq("matched_partitions", "mismatched_partitions",
              "only_in_source", "only_in_target", "matched_rows",
              "matched_values", "mismatched_values")
              .foreach(c => zero = zero.withColumn(c, lit(0L)))
            store.write("task_status", zero
              .withColumn("last_token", lit(null).cast(tokenType))
              .withColumn("table_name", lit(spec.table))
              .withColumn("status", lit("done"))
              .withColumn("job_id", lit(config.jobId))
              .withColumn("run_ts", lit(runTs)),
              partitionBy = Seq("job_id"))
          }
          // digests are journaled LAST: a crash before this point leaves
          // the OLD digests in place, so the next incremental run still
          // sees the affected buckets as changed and re-compares them —
          // writing digests first would instead mask a half-journaled run
          // as fully unchanged and lose its records permanently
          curDigests.foreach { cur =>
            store.write("bucket_digests", cur
              .withColumn("table_name", lit(spec.table))
              .withColumn("job_id", lit(config.jobId))
              .withColumn("run_ts", lit(runTs)),
              partitionBy = Seq("job_id"))
            cur.unpersist()
          }
          // O3: the sampled reverse-read validation pass
          // (DiffContext.java:54-57) — re-compare sampled partitions with
          // reversed duplicate pairing; journal any verdict disagreement
          if (options.reverseReadProbability > 0.0)
            store.write("reverse_checks",
              DiffEngine.reverseValidation(src, tgt, spec,
                  options.reverseReadProbability, token)
                .filter(!col("agree"))
                .select(col("token"), col("fwd_classification"),
                  col("rev_classification"))
                .withColumn("table_name", lit(spec.table))
                .withColumn("job_id", lit(config.jobId))
                .withColumn("run_ts", lit(runTs)),
              partitionBy = Seq("job_id"))
          // whole-job totals: newest journal row per bucket across ALL runs
          // of this job_id (a resumed run's own frame covers only the
          // pending remainder; the journal carries the rest)
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("bucket")).orderBy(col("run_ts").desc)
          val latest = store.read("task_status")
            .filter(col("job_id") === config.jobId && col("table_name") === spec.table)
            .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          val counters = Seq("matched_partitions", "mismatched_partitions",
            "only_in_source", "only_in_target", "matched_rows",
            "matched_values", "mismatched_values")
          val sums = counters.map(c => coalesce(sum(col(c)), lit(0L)).as(c))
          val totalsRow = latest.agg(sums.head, sums.tail: _*).collect()(0)
          val skippedRow =
            if (options.disallowedTokens.isEmpty && !options.samplingEnabled &&
              options.specificTokens.isEmpty) 0L
            else DiffEngine.skippedPartitions(sq.valid, tq.valid, spec, options,
              token).count()
          val stats = RangeStats(
            matchedPartitions = totalsRow.getAs[Long]("matched_partitions"),
            mismatchedPartitions = totalsRow.getAs[Long]("mismatched_partitions"),
            onlyInSource = totalsRow.getAs[Long]("only_in_source"),
            onlyInTarget = totalsRow.getAs[Long]("only_in_target"),
            matchedRows = totalsRow.getAs[Long]("matched_rows"),
            matchedValues = totalsRow.getAs[Long]("matched_values"),
            mismatchedValues = totalsRow.getAs[Long]("mismatched_values"),
            skippedPartitions = skippedRow)
          import spark.implicits._
          store.write("job_results", Seq((
            config.jobId, spec.table, runTs,
            stats.matchedPartitions, stats.mismatchedPartitions,
            stats.onlyInSource, stats.onlyInTarget, stats.matchedRows,
            stats.matchedValues, stats.mismatchedValues, stats.skippedPartitions))
            .toDF("job_id", "table_name", "run_ts",
              "matched_partitions", "mismatched_partitions", "only_in_source",
              "only_in_target", "matched_rows", "matched_values",
              "mismatched_values", "skipped_partitions"),
            partitionBy = Seq("job_id"))
          spec.table -> stats
        } finally {
          ps.unpersist()
          digestPre.foreach(_.unpersist())
          curDigests.foreach(_.unpersist()) // no-op if already freed
        }
      }.toMap
      // metrics parity: the reference's per-table counter series
      // (Differ.updateMetrics) as named Spark accumulators
      results.foreach { case (table, stats) =>
        DiffMetrics.update(spark, "graft", table, stats)
      }
      postJobHooks.foreach(_(results))
      results
    } finally store.releaseRunLock(config.jobId)
  }
}
