package graft

import graft.cli.JobConfig

class JobConfigSpec extends SparkSpec {

  private val fullYaml =
    """keyspace_tables:
      |  - keyspace1.lineitem
      |  - keyspace1.orders
      |splits: 500
      |buckets: 20
      |rate_limit: 5000
      |job_id: 4e2c6c6b-bed7-4c4e-bd4c-28bef89c3cef
      |token_scan_fetch_size: 1000
      |partition_read_fetch_size: 1000
      |read_timeout_millis: 10000
      |reverse_read_probability: 0.25
      |partitioner: murmur3
      |consistency_level: ALL
      |specific_tokens: "1, 2, 3"
      |disallowed_tokens: "99"
      |partition_sampling_probability: 0.5
      |metadata_options:
      |  keyspace: cassandradiff
      |  ttl: 31536000
      |  should_init: true
      |cluster_config:
      |  source:
      |    impl: "parquet"
      |    path: "/root/testdata/sf0.001"
      |  target:
      |    impl: "parquet"
      |    path: "/root/testdata/sf0.001"
      |""".stripMargin

  test("full yaml: every reference key parses") {
    val c = JobConfig.loadString(fullYaml)
    assert(c.keyspaceTables === Seq("keyspace1.lineitem", "keyspace1.orders"))
    assert(c.splits === 500 && c.buckets === 20 && c.rateLimit === 5000)
    assert(c.jobId.contains("4e2c6c6b-bed7-4c4e-bd4c-28bef89c3cef"))
    assert(c.reverseReadProbability === 0.25)
    assert(c.partitioner === "murmur3")
    assert(c.specificTokens === Seq(1L, 2L, 3L))
    assert(c.disallowedTokens === Seq(99L))
    assert(c.partitionSamplingProbability === 0.5)
    assert(c.metadataKeyspace === "cassandradiff" && c.metadataTtl === 31536000L)
    assert(c.clusterConfig("source")("path") === "/root/testdata/sf0.001")
    val opts = c.toDiffOptions
    assert(opts.buckets === 20)
    assert(opts.samplingNum === 500 && opts.samplingDen === 1000)
  }

  test("defaults match the reference when keys are absent") {
    val c = JobConfig.loadString("keyspace_tables:\n  - ks.t1\n")
    assert(c.splits === 10000)   // YamlJobConfiguration.java:35
    assert(c.buckets === 100)    // :38
    assert(c.rateLimit === 10000) // :39
    assert(c.partitionSamplingProbability === 1.0)
    assert(c.jobId.isEmpty)
    assert(c.partitioner === "xxhash64")
    assert(!c.toDiffOptions.samplingEnabled)
  }

  test("absent keyspace_tables => auto-discovery mode (empty list)") {
    val c = JobConfig.loadString("buckets: 5\n")
    assert(c.keyspaceTables.isEmpty)
  }

  test("retry_options parse: exponential impl + delays; absent => NoRetry") {
    import graft.journal.RetryPolicy
    val c = JobConfig.loadString(
      """keyspace_tables:
        |  - ks.t1
        |retry_options:
        |  impl: "org.apache.cassandra.diff.ExponentialRetryStrategyProvider"
        |  base_delay_ms: 100
        |  total_delay_ms: 1000
        |""".stripMargin)
    assert(c.retryPolicy === RetryPolicy(100L, 1000L))
    // defaults when only impl is given (1 s base / 30 min budget,
    // ExponentialRetryStrategyProvider.java:46-48)
    val d = JobConfig.loadString(
      "keyspace_tables:\n  - ks.t1\nretry_options:\n  impl: \"Exponential\"\n")
    assert(d.retryPolicy === RetryPolicy.Exponential)
    // no retry_options, or an unknown impl => the reference's NoRetry fallback
    assert(JobConfig.loadString("buckets: 5\n").retryPolicy === RetryPolicy.NoRetry)
    val u = JobConfig.loadString(
      "keyspace_tables:\n  - ks.t1\nretry_options:\n  impl: \"bogus\"\n")
    assert(u.retryPolicy === RetryPolicy.NoRetry)
  }

  test("retry schedule: doubling pauses, cumulative sleep capped at total") {
    import graft.journal.RetryPolicy
    // base 100ms, budget 1000ms: 100+200+400 = 700, then min(300, 800)
    // truncates the last pause — exactly the reference's Exponential.get
    assert(RetryPolicy(100L, 1000L).schedule === List(100L, 200L, 400L, 300L))
    assert(RetryPolicy(100L, 100L).schedule === List(100L))
    assert(RetryPolicy.NoRetry.schedule === Nil)
    // schedule sums never exceed the budget even for long horizons
    val s = RetryPolicy(1L, 1000000L).schedule
    assert(s.sum === 1000000L && s.head === 1L)
  }

  test("retry wrapper: flaky action succeeds within budget, rethrows past it") {
    import graft.journal.RetryPolicy
    var calls = 0
    val got = RetryPolicy(1L, 10L).retry("flaky") {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      "ok"
    }
    assert(got === "ok" && calls === 3)
    // NoRetry: one attempt, failure propagates
    var once = 0
    assertThrows[RuntimeException](
      RetryPolicy.NoRetry.retry("fatal") { once += 1; sys.error("boom") })
    assert(once === 1)
    // budget exhausted: attempts = schedule size + 1, then rethrow
    var n = 0
    assertThrows[RuntimeException](
      RetryPolicy(1L, 3L).retry("always") { n += 1; sys.error("down") })
    assert(n === RetryPolicy(1L, 3L).schedule.size + 1)
    // excluded exception classes are never retried (retryIfNot,
    // RetryStrategy.java:45-65)
    var x = 0
    assertThrows[IllegalStateException](
      RetryPolicy(1L, 100L).retry("excluded",
        excluding = Seq(classOf[IllegalStateException])) {
        x += 1; throw new IllegalStateException("no retry")
      })
    assert(x === 1)
  }

  test("engine-extension keys parse: digest_first and generate_repair") {
    val c = JobConfig.loadString(
      "keyspace_tables:\n  - ks.t1\ndigest_first: true\ngenerate_repair: true\n")
    assert(c.digestFirst && c.generateRepair)
    // absent => off (reference configs carry neither key)
    val d = JobConfig.loadString("buckets: 5\n")
    assert(!d.digestFirst && !d.generateRepair)
    val e = JobConfig.loadString("digest_first: false\ngenerate_repair: false\n")
    assert(!e.digestFirst && !e.generateRepair)
  }

  test("tolerances parse per table/column; digestFirst combination rejected") {
    val c = JobConfig.loadString(
      """tolerances:
        |  ks.lineitem:
        |    l_extendedprice: 0.01
        |    l_tax: 1e-6
        |""".stripMargin)
    assert(c.tolerances === Map(
      "ks.lineitem" -> Map("l_extendedprice" -> 0.01, "l_tax" -> 1e-6)))
    assert(JobConfig.loadString("buckets: 5\n").tolerances.isEmpty)
    // digests hash exact values — the runner config must refuse the combo
    intercept[IllegalArgumentException] {
      graft.api.DiffJobConfig("j", Nil, digestFirst = true,
        tolerances = Map("t" -> Map("v" -> 0.1)))
    }
  }

  test("table specs resolve roles from the corpus registry") {
    val li = JobConfig.tableSpec("keyspace1.lineitem")
    assert(li.pk === Seq("l_orderkey") && li.clustering === Seq("l_linenumber"))
    assert(JobConfig.tableSpec("orders").clustering.isEmpty)
  }
}
