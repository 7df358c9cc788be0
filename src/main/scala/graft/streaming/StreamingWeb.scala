package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.Web

/** Streaming forms of the URL/domain curation family — the ingest-side
  * versions of web_url_dedup and web_domain_concentration's quota, for
  * crawl pipelines where URLs arrive continuously and both dedup and
  * per-domain capping must happen before documents are fetched/stored.
  */
object StreamingWeb {

  /** Drop URLs that canonicalize to an already-seen key within
    * `watermark` of each other — the streaming web_url_dedup. State is
    * keyed by the canonical string only and bounded by the watermark
    * horizon (Spark's `dropDuplicatesWithinWatermark` contract: re-
    * emissions beyond the horizon are the documented trade-off, same as
    * [[StreamingDedup.dropExactDups]]).
    */
  def dropUrlDups(stream: DataFrame, urlCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("canon_url", Web.canonicalUrl(col(urlCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("canon_url")

  /** One emitted row per ADMITTED document: its registered domain, id,
    * and 1-based admission rank within the domain.
    */
  case class DomainAdmit(domain: String, doc_id: Long, n_in_domain: Long)

  /** Per-registered-domain admission quota: admit at most `k` documents
    * per domain over the stream's lifetime (the continuous form of
    * web_domain_concentration's quota cap). Within a micro-batch, ties
    * admit in ascending `idCol` order — deterministic replay.
    *
    * State discipline: ONE long counter per registered domain. Domains
    * are a bounded dimension (the C4 premise the batch operator's rank
    * windows rely on), so state is bounded by the domain universe, not
    * the stream length — no watermark needed, and NoTimeout is correct:
    * a quota is a lifetime budget, not a windowed one.
    */
  def domainQuota(stream: DataFrame, urlCol: String, idCol: String,
      k: Int): Dataset[DomainAdmit] = {
    require(k >= 1, "k must be >= 1")
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream.select(
        Web.registeredDomain(Web.hostOf(col(urlCol))).as("_1"),
        col(idCol).cast("long").as("_2"))
      .as[(String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Long, DomainAdmit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[(String, Long)],
            state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val admitted = rows.map(_._2).toVector.sorted.iterator
            .takeWhile(_ => n < k)
            .map { id => n += 1; DomainAdmit(domain, id, n) }
            .toVector
          state.update(n)
          admitted.iterator
      }
  }
}
