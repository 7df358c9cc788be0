package graft.journal

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.RangeStats

/** The job journal — the reference's 12-table `cassandradiff` metadata
  * keyspace (JobMetadataDb.java:493-652) as parquet tables under one root.
  * Cassandra-specific artifacts (bucket fan-out to dodge wide partitions,
  * per-index duplicate tables) disappear: each logical table is one
  * partitioned parquet dataset and every "index" is a filter Spark pushes
  * down.
  *
  * Layout:
  *   <root>/job_summary/     job params + start metadata (job_summary +
  *                           job_start_index tables, JobMetadataDb.java:496-544)
  *   <root>/task_status/     per (table, bucket) progress: running stats +
  *                           last_token watermark (job_status,
  *                           JobMetadataDb.java:546-570; checkpoint
  *                           RangeComparator.java:231-241)
  *   <root>/mismatches/      one row per mismatched partition
  *                           (JobMetadataDb.java:572-585)
  *   <root>/errors/          per-partition error detail
  *                           (JobMetadataDb.java:587-607)
  *   <root>/job_results/     final per-table RangeStats
  *                           (JobMetadataDb.java:609-617)
  *   <root>/running_jobs/<job_id>.lock   the concurrency lock (O21)
  */
final class MetadataStore(val root: String,
    retry: RetryPolicy = RetryPolicy.NoRetry)(implicit spark: SparkSession) {

  private def path(table: String): String = s"$root/$table"

  def write(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    if (partitionBy.isEmpty)
      appendAtomic(table, df, Nil)
    else {
      // a dynamic-partition write of an EMPTY frame emits no files at all,
      // leaving a directory spark.read cannot infer a schema from (the
      // healthy outcomes — clean diff ⇒ empty mismatches, agreeing reverse
      // checks — hit exactly this). Record the schema in a `_schema`
      // sidecar instead (underscore-prefixed dirs are invisible to Spark's
      // file index, so later real appends are unaffected); `read` falls
      // back to it when the dataset holds no data files.
      val materialized = df.persist()
      try {
        if (materialized.isEmpty)
          retry.retry(s"journal schema marker $table") {
            materialized.limit(0).write.mode(SaveMode.Overwrite)
              .parquet(path(table) + "/_schema")
          }
        else appendAtomic(table, materialized, partitionBy)
      } finally materialized.unpersist()
    }

  /** Retry-safe append. A raw `SaveMode.Append` is NOT idempotent under
    * [[RetryPolicy]]: an attempt that dies after (or during) job commit can
    * leave committed part files behind, and the retry then appends a second
    * copy of every row — silently inflating the counters the results API
    * serves (the reference retries idempotent CQL upserts, so this hazard
    * is file-sink-specific). Instead each append OVERWRITES a write-unique
    * hidden staging dir — an arbitrary-failure retry replaces its own
    * partial output rather than adding to the live dataset — and only a
    * fully-successful attempt is published by renaming the staged part
    * files into the dataset (driver-local metadata moves, no data rewrite;
    * dot-prefixed dirs are invisible to Spark's file index, so a crashed
    * attempt's leftover staging is inert until cleaned).
    */
  private def appendAtomic(table: String, df: DataFrame,
      partitionBy: Seq[String]): Unit = {
    val staging =
      Paths.get(path(table), s".staging-${java.util.UUID.randomUUID}")
    retry.retry(s"journal write $table") {
      val w = df.write.mode(SaveMode.Overwrite)
      (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
        .parquet(staging.toString)
    }
    // the publish is retried too, and is naturally resumable: each moved
    // file leaves the staging tree, so a re-attempt only moves the
    // remainder (REPLACE_EXISTING covers a rename that half-completed).
    // A PROCESS crash mid-publish can still leave a partial append — the
    // runner's write ordering is what bounds that blast radius (digests
    // last, so a torn run re-compares instead of replaying).
    retry.retry(s"journal publish $table") {
      publish(staging, Paths.get(path(table)))
    }
  }

  /** Move staged parquet files (keeping their partition subdirs) into the
    * live dataset, then drop the staging tree. Part-file names carry a
    * per-write UUID, so renames cannot collide with existing data.
    */
  private def publish(staging: Path, dest: Path): Unit = {
    Files.createDirectories(dest)
    val walk = Files.walk(staging)
    val parts =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet")).toList
      } finally walk.close()
    parts.foreach { f =>
      val target = dest.resolve(staging.relativize(f))
      Files.createDirectories(target.getParent)
      Files.move(f, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    deleteRecursively(staging)
  }

  private def deleteRecursively(dir: Path): Unit = {
    val walk = Files.walk(dir)
    val all =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toList
      } finally walk.close()
    all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  def read(table: String): DataFrame = read(table, mergeSchema = false)

  /** `mergeSchema` widens the read across journal rows written by older
    * engine versions with fewer columns (schema evolution tolerance).
    */
  def read(table: String, mergeSchema: Boolean): DataFrame = {
    val base = Paths.get(path(table))
    val marker = base.resolve("_schema")
    if (Files.exists(marker) && !hasDataFiles(base, marker))
      spark.read.parquet(marker.toString)
    else
      spark.read.option("mergeSchema", mergeSchema.toString)
        .parquet(path(table))
  }

  /** Any parquet data file Spark's file index would actually see — i.e.
    * outside the `_schema` sidecar and outside hidden (`.`/`_`-prefixed)
    * dirs such as a crashed attempt's `.staging-*` leftovers?
    */
  private def hasDataFiles(base: Path, marker: Path): Boolean = {
    val walk = Files.walk(base)
    try walk.anyMatch { f =>
      val rel = base.relativize(f)
      f.toString.endsWith(".parquet") && !f.startsWith(marker) &&
        (0 until rel.getNameCount).forall { i =>
          val n = rel.getName(i).toString
          !n.startsWith(".") && !n.startsWith("_")
        }
    }
    finally walk.close()
  }

  def exists(table: String): Boolean = Files.exists(Paths.get(path(table)))

  def readOrEmpty(table: String, schemaOf: => DataFrame): DataFrame =
    if (exists(table)) read(table) else schemaOf.limit(0)

  /** O21: the `running_jobs` LWT lock (`INSERT ... IF NOT EXISTS`,
    * JobMetadataDb.java:359-376) emulated with an atomic file create.
    * Returns true iff this caller acquired the lock.
    */
  def acquireRunLock(jobId: String): Boolean = {
    val dir = Paths.get(root, "running_jobs")
    Files.createDirectories(dir)
    try { Files.createFile(dir.resolve(s"$jobId.lock")); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** O21: `markNotRunning` / lock release (JobMetadataDb.java:461-490). */
  def releaseRunLock(jobId: String): Unit =
    Files.deleteIfExists(Paths.get(root, "running_jobs", s"$jobId.lock"))

  def isRunning(jobId: String): Boolean =
    Files.exists(Paths.get(root, "running_jobs", s"$jobId.lock"))

  /** Final per-table stats row (job_results, JobMetadataDb.java:609-617). */
  def writeResults(jobId: String, statsByTable: DataFrame): Unit =
    write("job_results", statsByTable.withColumn("job_id", lit(jobId)))
}

object MetadataStore {
  /** Typed view of a job_results/task_status counter row. */
  def toRangeStats(row: org.apache.spark.sql.Row): RangeStats = RangeStats(
    matchedPartitions = row.getAs[Long]("matched_partitions"),
    mismatchedPartitions = row.getAs[Long]("mismatched_partitions"),
    onlyInSource = row.getAs[Long]("only_in_source"),
    onlyInTarget = row.getAs[Long]("only_in_target"),
    matchedRows = row.getAs[Long]("matched_rows"),
    matchedValues = row.getAs[Long]("matched_values"),
    mismatchedValues = row.getAs[Long]("mismatched_values"),
    skippedPartitions =
      if (row.schema.fieldNames.contains("skipped_partitions"))
        row.getAs[Long]("skipped_partitions") else 0L)
}
