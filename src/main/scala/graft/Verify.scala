package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as long and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "1s")
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.9")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query watchdog: one pathological query (or a host-level stall)
    // must not wedge the whole correctness gate. Each query runs in its
    // own job group; on timeout the group is cancelled and the dump moves
    // on — that query alone fails its check.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "600").toLong
    // Local-iteration filter (NOT used by the driver): comma-separated
    // query names; restricts both the dump and the emitted oracle json so
    // tools/check_oracle.py checks exactly the selected queries.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      val work = Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(work, timeoutSec.seconds)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s (cancelled)")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape — a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    def q(s: String): String = graft.core.JsonUtil.quote(s)
    // The driver keys its correctness rows by the result-directory name
    // INCLUDING the ".parquet" suffix; emit each oracle under both the bare
    // name and the suffixed name so either lookup convention resolves.
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
