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

  test("table specs resolve roles from the corpus registry") {
    val li = JobConfig.tableSpec("keyspace1.lineitem")
    assert(li.pk === Seq("l_orderkey") && li.clustering === Seq("l_linenumber"))
    assert(JobConfig.tableSpec("orders").clustering.isEmpty)
  }
}
