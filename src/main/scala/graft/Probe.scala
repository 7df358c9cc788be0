package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Action-count probe (not part of the driver contract): runs each named
  * `SparkEntry.queries` entry once through the noop sink and reports how
  * many Spark JOBS (actions), stages and tasks it scheduled and how much
  * of the wall time was covered by running jobs. At small scale the
  * per-action fixed cost (planning + scheduling + result handling)
  * dominates many queries — this is the direct measurement behind any
  * "converted an eager materialization to a lazy one" claim, which a
  * final-plan dump cannot show (both shapes print the same truncated
  * scan). Usage: `sbt "runMain graft.Probe dedup_clusters events_kcore"`;
  * env `SPARK_GRAFT_SF_DIR` overrides the data dir.
  */
object Probe {
  private final class Counter extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val jobWindows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.remove(j.jobId)
      if (s != 0L) jobWindows.add((s, System.nanoTime()))
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      tasks.incrementAndGet()
  }

  /** total wall covered by >=1 running job, from merged job windows */
  private def coveredSec(ws: Seq[(Long, Long)]): Double = {
    val sorted = ws.sortBy(_._1)
    var covered = 0L
    var curS = 0L
    var curE = 0L
    sorted.foreach { case (s, e) =>
      if (s > curE) { covered += curE - curS; curS = s; curE = e }
      else if (e > curE) curE = e
    }
    covered += curE - curS
    covered / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // one untimed warm-up of the first query so JIT/parquet-footer cost
    // doesn't inflate the first probe line
    names.headOption.flatMap(SparkEntry.queries.get).foreach { q =>
      try q(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-34s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%7s ${"wall_s"}%8s ${"job_s"}%8s")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          val c = new Counter
          spark.sparkContext.addSparkListener(c)
          val t0 = System.nanoTime()
          q(spark, dir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          // drain the async listener bus before reading the counters
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(c)
          import scala.jdk.CollectionConverters._
          val jw = c.jobWindows.asScala.toSeq
          println(f"$n%-34s ${c.jobs.get()}%5d ${c.stages.get()}%7d ${c.tasks.get()}%7d $wall%8.2f ${coveredSec(jw)}%8.2f")
        case None => println(s"unknown query '$n'")
      }
    }
    spark.stop()
  }
}
