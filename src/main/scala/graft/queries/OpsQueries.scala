package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DiffOptions
import graft.engine.{DiffEngine, OracleSql, Perturb, Tables}
import graft.journal.Resume
import graft.sources.{ParquetSource, SchemaOps}

/** Job-control operator queries: token filters (O9), sampling (O10),
  * resume (O12), reverse-read validation (O3), schema discovery (O19) and
  * the ResultsApi-shaped journal queries (O22).
  */
object OpsQueries {

  import Perturb.{lineitemSpec, ordersSpec}

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")
  private val idTok = DiffEngine.identityToken _

  private val Disallowed = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
  private val disallowedSqlList = Disallowed.mkString(", ")

  /** Per-table partitionStats frame for the journal-shaped queries.
    * Built FRESH on every call: each query invocation recomputes the
    * diff from the parquet inputs. (An earlier JVM-lifetime persisted
    * cache here — the production persist-once-derive-all shape
    * DiffRunner still uses — let repeated bench/verify invocations of
    * api_mismatch_summary / api_results_by_table skip the diff
    * entirely, so their timings no longer measured the engine. Within
    * a single query plan each frame is referenced exactly once, so
    * nothing is lost by rebuilding.)
    */
  private def tablePs(s: SparkSession, dir: String, table: String): DataFrame =
    table match {
      case "lineitem" =>
        DiffEngine.partitionStats(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
          lineitemSpec, idTok)
      case "orders" =>
        DiffEngine.partitionStats(ord(s, dir), Perturb.ordersTarget(ord(s, dir)),
          ordersSpec, idTok)
    }

  private def noSkips(s: SparkSession): DataFrame =
    s.range(1).select(lit(0L).as("skipped_partitions"))

  /** journal fixture for the resume query: buckets 0-5 done, 6-7
    * in-progress with watermarks, 8-15 untouched.
    */
  private val journalFixture: Seq[(Long, String, Option[Long])] =
    (0L to 5L).map(b => (b, Resume.StatusDone, None: Option[Long])) ++
      Seq((6L, Resume.StatusInProgress, Some(3000L)),
        (7L, Resume.StatusInProgress, Some(6000L)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O9: disallowed-token reject list → skipped counter
    "diff_token_filter" -> ((s, dir) =>
      DiffEngine.rangeStats(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, DiffOptions(disallowedTokens = Disallowed), idTok)),
    // O10: deterministic per-key sampling (keep pmod(token,10) < 3)
    "diff_sampling" -> ((s, dir) =>
      DiffEngine.rangeStats(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, DiffOptions(samplingNum = 3, samplingDen = 10), idTok)),
    // O12: resume — pending work per bucket given a task_status journal
    "diff_resume" -> ((s, dir) => {
      import s.implicits._
      val keys = DiffEngine.keyScan(li(s, dir), lineitemSpec, idTok)
        .withColumn("bucket", DiffEngine.bucket(col("token"), 16))
      val journal = journalFixture.toDF("bucket", "status", "last_token")
      Resume.pending(keys, journal)
        .groupBy("bucket").agg(count(lit(1)).as("n_pending"),
          min(col("token")).as("min_token"))
    }),
    // O3: reverse-order read — last clustering row of sampled partitions
    "diff_reverse_read" -> ((s, dir) =>
      DiffEngine.reverseRead(
        li(s, dir).filter(col("l_orderkey") % 20 === 0), lineitemSpec)
        .filter(col("rev_rank") === 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")),
    // O3 wired: sampled reverse-read validation. The sample here is a
    // DuckDB-mirrorable key predicate (l_orderkey % 10 = 0) rather than
    // the engine's xxhash64 sampler — same sampled-subset semantics, and
    // the oracle can reproduce it exactly
    "diff_reverse_validation" -> ((s, dir) =>
      DiffEngine.reverseValidation(
        li(s, dir).filter(col("l_orderkey") % 10 === 0),
        Perturb.lineitemTarget(li(s, dir)).filter(col("l_orderkey") % 10 === 0),
        lineitemSpec, probability = 1.0, idTok)
        .agg(count(lit(1)).as("n_checked"),
          sum(when(!col("agree"), 1L).otherwise(0L)).as("n_disagree"))),
    // O19: schema auto-discovery — intersect minus disallowed, with one
    // side missing a table (region) and "events" disallowed
    "schema_intersect" -> ((s, dir) => {
      import s.implicits._
      val srcTables = ParquetSource(dir).listTables(s)
      val tgtTables = srcTables.filterNot(_ == "region")
      SchemaOps.intersect(srcTables, tgtTables, Set("events"))
        .toDF("table_name")
    }),
    // O22: mismatch summary across a two-table job (group-merge of
    // DBService.java:215-228) — one per-table diff each
    "api_mismatch_summary" -> ((s, dir) => {
      val m1 = DiffEngine.mismatchesFromPartitions(
        tablePs(s, dir, "lineitem"), lineitemSpec, buckets = 100)
      val m2 = DiffEngine.mismatchesFromPartitions(
        tablePs(s, dir, "orders"), ordersSpec, buckets = 100)
      m1.select("table_name", "mismatch_type")
        .unionByName(m2.select("table_name", "mismatch_type"))
        .groupBy("table_name", "mismatch_type").agg(count(lit(1)).as("n"))
    }),
    // O15: quarantine — null partition keys diverted with origin + reason
    "diff_quarantine" -> ((s, dir) => {
      val withNulls = li(s, dir).withColumn("l_orderkey",
        when(col("l_partkey") % 97 === 0, lit(null)).otherwise(col("l_orderkey")))
      val split = graft.engine.Quarantine.split(withNulls, lineitemSpec, "source")
      split.errors.groupBy("origin", "error").agg(count(lit(1)).as("n"))
        .unionByName(
          split.valid.agg(count(lit(1)).as("n"))
            .withColumn("origin", lit("source"))
            .withColumn("error", lit("VALID"))
            .select("origin", "error", "n"))
    }),
    // O22/O8: per-table job results (job_results rows of a two-table job),
    // from its own per-table diffs — same derivation as the mismatch summary
    "api_results_by_table" -> ((s, dir) => {
      val r1 = DiffEngine.rangeStatsFromPartitions(
        tablePs(s, dir, "lineitem"), lineitemSpec, noSkips(s))
      val r2 = DiffEngine.rangeStatsFromPartitions(
        tablePs(s, dir, "orders"), ordersSpec, noSkips(s))
      r1.unionByName(r2)
    }),
  )

  def oracles: Map[String, String] = {
    val filteredSrc =
      s"SELECT * FROM lineitem WHERE l_orderkey NOT IN ($disallowedSqlList)"
    val filteredTgt =
      s"SELECT * FROM (${Perturb.lineitemTargetSql}) WHERE l_orderkey NOT IN ($disallowedSqlList)"
    val skippedDisallowed =
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS skipped_partitions FROM (
         |  SELECT l_orderkey FROM lineitem
         |  UNION
         |  SELECT l_orderkey FROM (${Perturb.lineitemTargetSql})
         |) u WHERE l_orderkey IN ($disallowedSqlList)""".stripMargin
    val sampledSrc = "SELECT * FROM lineitem WHERE l_orderkey % 10 < 3"
    val sampledTgt =
      s"SELECT * FROM (${Perturb.lineitemTargetSql}) WHERE l_orderkey % 10 < 3"
    val skippedSampling =
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS skipped_partitions FROM (
         |  SELECT l_orderkey FROM lineitem
         |  UNION
         |  SELECT l_orderkey FROM (${Perturb.lineitemTargetSql})
         |) u WHERE l_orderkey % 10 >= 3""".stripMargin
    val journalValues = journalFixture
      .map { case (b, st, lt) => s"($b, '$st', ${lt.map(_.toString).getOrElse("NULL")})" }
      .mkString(", ")
    Map(
      "diff_token_filter" -> OracleSql.rangeStats(lineitemSpec,
        filteredSrc, filteredTgt, skippedDisallowed),
      "diff_sampling" -> OracleSql.rangeStats(lineitemSpec,
        sampledSrc, sampledTgt, skippedSampling),
      "diff_resume" ->
        s"""WITH keys AS (
           |  SELECT DISTINCT l_orderkey, CAST(l_orderkey AS BIGINT) AS token,
           |         CAST(l_orderkey % 16 AS BIGINT) AS bucket
           |  FROM lineitem
           |),
           |j AS (SELECT * FROM (VALUES $journalValues) AS t(bucket, status, last_token)),
           |p AS (
           |  SELECT k.* FROM keys k LEFT JOIN j ON k.bucket = j.bucket
           |  WHERE j.status IS NULL
           |     OR (j.status = 'in_progress' AND (j.last_token IS NULL OR k.token > j.last_token))
           |)
           |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pending,
           |       CAST(MIN(token) AS BIGINT) AS min_token
           |FROM p GROUP BY bucket""".stripMargin,
      "diff_reverse_validation" -> OracleSql.reverseValidation(lineitemSpec,
        s"SELECT * FROM (${Perturb.lineitemSrcSql}) WHERE l_orderkey % 10 = 0",
        s"SELECT * FROM (${Perturb.lineitemTargetSql}) WHERE l_orderkey % 10 = 0"),
      "diff_reverse_read" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM (
          |  SELECT l_orderkey, l_linenumber, l_quantity,
          |         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC) AS rn
          |  FROM lineitem WHERE l_orderkey % 20 = 0
          |) WHERE rn = 1""".stripMargin,
      // fixed corpus ⇒ the expected intersection is a constant set:
      // all tables minus region (absent on target) minus events (disallowed)
      "schema_intersect" ->
        """SELECT * FROM (VALUES ('customer'), ('documents'), ('embeddings'),
          |  ('lineitem'), ('nation'), ('orders'), ('part'), ('supplier'))
          |  AS t(table_name)""".stripMargin,
      "diff_quarantine" ->
        """SELECT 'source' AS origin, 'null_pk_l_orderkey' AS error,
          |       CAST(COUNT(*) AS BIGINT) AS n
          |FROM lineitem WHERE l_partkey % 97 = 0
          |UNION ALL
          |SELECT 'source' AS origin, 'VALID' AS error,
          |       CAST(COUNT(*) AS BIGINT) AS n
          |FROM lineitem WHERE l_partkey % 97 <> 0""".stripMargin,
      "api_mismatch_summary" ->
        s"""SELECT table_name, mismatch_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
           |  SELECT table_name, mismatch_type FROM (${OracleSql.mismatches(lineitemSpec,
                Perturb.lineitemSrcSql, Perturb.lineitemTargetSql, 100)})
           |  UNION ALL
           |  SELECT table_name, mismatch_type FROM (${OracleSql.mismatches(ordersSpec,
                Perturb.ordersSrcSql, Perturb.ordersTargetSql, 100)})
           |) GROUP BY table_name, mismatch_type""".stripMargin,
      "api_results_by_table" ->
        s"""SELECT * FROM (${OracleSql.rangeStats(lineitemSpec,
             Perturb.lineitemSrcSql, Perturb.lineitemTargetSql)})
           |UNION ALL
           |SELECT * FROM (${OracleSql.rangeStats(ordersSpec,
             Perturb.ordersSrcSql, Perturb.ordersTargetSql)})""".stripMargin,
    )
  }
}
