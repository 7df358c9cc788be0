package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingWeb

/** Streaming URL dedup + per-domain admission quota — the ingest-side
  * web-curation contracts: raw URL variants that canonicalize equally
  * collapse across micro-batches, and a domain's lifetime budget holds
  * across batches.
  */
class StreamingWebSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("dropUrlDups: canonical-equal raw variants collapse across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingWeb
      .dropUrlDups(input.toDF().toDF("id", "url", "ts"), "url", "ts")
      .writeStream.format("memory").queryName("url_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two raw variants of the same location + one distinct
      input.addData(
        (1L, "HTTPS://A.com:443/p?utm_source=x&id=7#f", ts(0)),
        (2L, "https://a.com/p?id=7", ts(1)),
        (3L, "https://b.com/q", ts(1)))
      q.processAllAvailable()
      // batch 2: a third variant of the same location, within watermark
      input.addData((4L, "https://A.COM/p?id=7&fbclid=z", ts(2)))
      q.processAllAvailable()
      val got = spark.table("url_dedup").select("id", "canon_url")
        .as[(Long, String)].collect().toMap
      assert(got.keySet === Set(1L, 3L)) // first variant + the distinct
      assert(got(1L) === "https://a.com/p?id=7")
    } finally q.stop()
  }

  test("domainQuota: lifetime k per registered domain across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingWeb
      .domainQuota(input.toDF().toDF("id", "url"), "url", "id", k = 3)
      .writeStream.format("memory").queryName("dom_quota")
      .outputMode(OutputMode.Update()).start()
    try {
      def u(sub: String, dom: String, id: Long) =
        (id, s"https://$sub.$dom/p/$id")
      // batch 1: 2 docs for x.com (different subdomains — same
      // registered domain), 1 for y.co.uk
      input.addData(u("www", "x.com", 10), u("cdn", "x.com", 11),
        u("a", "y.co.uk", 20))
      q.processAllAvailable()
      // batch 2: 2 more for x.com (only 1 admitted — lifetime quota),
      // 1 more for y.co.uk
      input.addData(u("b", "x.com", 12), u("c", "x.com", 13),
        u("d", "y.co.uk", 21))
      q.processAllAvailable()
      val got = spark.table("dom_quota")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      assert(got("x.com") === Set((10L, 1L), (11L, 2L), (12L, 3L)))
      assert(got("y.co.uk") === Set((20L, 1L), (21L, 2L)))
    } finally q.stop()
  }
}
