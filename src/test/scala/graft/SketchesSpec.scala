package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Sketches, Similarity}

/** Pins the native sketch expressions: per-row semantics equal to the
  * declarative (explode/aggregate) formulations they replaced, plus the
  * SQL registrations from [[graft.GraftExtensions]].
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 matches the explode + 64-sign-aggregate reference") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, "der die das und"),
      (3L, "x"), (4L, "a b a b a b")).toDF("id", "text")
    // declarative reference: explode tokens, 64 sign-count sums, reassemble
    val words = df.select(col("id"), explode(split(col("text"), " ")).as("w"))
    val h = xxhash64(col("w"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$i")
    }
    val want = words.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), (0 until 64).map(i =>
          when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val got = Dedup.withSimHash(df, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("minhash signature matches the explode + min-aggregate reference") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "a b"), (3L, "w1 w2 w3 w4"))
      .toDF("id", "text")
    val k = 16
    val sh = df.select(col("id"),
      explode(Dedup.wordShingles(col("text"), 3)).as("shingle"))
    val h = pmod(xxhash64(col("shingle")), lit(Dedup.MinHashPrime))
    val mins = (0 until k).map { i =>
      val (a, b) = Dedup.perm(i)
      min(pmod(h * a + b, lit(Dedup.MinHashPrime))).as(s"mh$i")
    }
    val want = sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"mh$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val got = Dedup.withMinHashSignature(df, "id", "text", 3, k)
      .select(col("id"), col("sig")).as[(Long, Seq[Long])].collect().toMap
    assert(got === want)
  }

  test("hyperplane sketch matches the posexplode + projection reference") {
    val dims = 8; val bits = 12
    val vecs = Seq(
      (1L, (0 until dims).map(j => j.toFloat / 3 - 1)),
      (2L, (0 until dims).map(j => -j.toFloat)),
      (3L, (0 until dims).map(_ => 0.5f)))
    val df = vecs.toDF("id", "v")
    val ex = df.select(col("id"), posexplode(col("v")).as(Seq("pos", "x")))
    val projections = (0 until bits).map { i =>
      val plane = typedlit((0 until dims).map(j => Similarity.planeSign(i, j)))
      sum(col("x").cast("double") * element_at(plane, col("pos") + 1)).as(s"__p$i")
    }
    val want = ex.groupBy(col("id")).agg(projections.head, projections.tail: _*)
      .select(col("id"), (0 until bits).map(i =>
          when(col(s"__p$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("sketch"))
      .as[(Long, Long)].collect().toMap
    val got = Similarity.withHyperplaneSketch(df, "id", "v", bits, dims)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("sketches are registered as SQL functions") {
    Seq((7L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
      .createOrReplaceTempView("sketch_docs")
    val row = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |       minhash_signature(split(text, ' '), 4) AS mh,
        |       hyperplane_sketch(array(1.0D, -2.0D, 0.5D), 8, 3) AS hp
        |FROM sketch_docs""".stripMargin).collect()(0)
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Seq[Long]]("mh").length === 4)
    val expected = Similarity.withHyperplaneSketch(
      Seq((1L, Seq(1.0, -2.0, 0.5))).toDF("id", "v"), "id", "v", 8, 3)
      .collect()(0).getAs[Long]("sketch")
    assert(row.getAs[Long]("hp") === expected)
    // round-9 registrations: winnow + cdc resolve and agree with the API
    val r2 = spark.sql(
      """SELECT winnow_fingerprints(word_shingles(split(text, ' '), 5), 4) AS fp,
        |       cdc_boundaries(word_shingles(split(text, ' '), 3), 4) AS cb
        |FROM sketch_docs""".stripMargin).collect()(0)
    val apiFp = Dedup.winnowFingerprints(
        Seq((7L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"),
        "id", "text").select("fingerprint").as[Long].collect().toSet
    assert(r2.getAs[Seq[Long]]("fp").toSet === apiFp)
    assert(r2.getAs[Seq[Long]]("cb").forall(i => i >= 1L && i <= 7L))
    // round-10 registration: jl_project resolves and agrees with the API
    val r3 = spark.sql(
      "SELECT jl_project(array(1.0D, -0.5D, 0.25D), 4, 3) AS p").collect()(0)
    val apiP = graft.functions.Embeddings.randomProjection(
        Seq((1L, Seq(1.0, -0.5, 0.25))).toDF("id", "v"), "id", "v",
        outDims = 4, inDims = 3)
      .collect()(0)
    assert(r3.getAs[Seq[Long]]("p") ===
      (0 until 4).map(d => apiP.getAs[Long](s"p$d")))
  }

  test("native word shingles match the declarative transform/slice reference") {
    val df = Seq((1L, "a b c d e"), (2L, "one two"), (3L, "solo"), (4L, ""),
      (5L, "w x y"), (6L, "exactly three words")).toDF("id", "text")
    val n = 3
    // declarative reference: the formulation the native expression replaced
    val words = split(col("text"), " ")
    val declarative = when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(0), size(words) - lit(n)),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
    val want = df.select(col("id"), declarative.as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val got = df.select(col("id"), Dedup.wordShingles(col("text"), n).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got === want)
  }

  test("sketch expressions survive CODEGEN_ONLY (no silent interpreted fallback)") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val r = Seq((1L, "a b c a", Seq(0.5f, -1.0f, 2.0f)))
        .toDF("id", "text", "vec")
        .select(
          graft.functions.Sketches.simhash64(split(col("text"), " ")).as("sh"),
          graft.functions.Sketches.minHashSig(split(col("text"), " "), 8).as("mh"),
          graft.functions.Sketches.hyperplaneSketch(col("vec"), 16, 3).as("hp"),
          graft.functions.Sketches.minHashSig(
            typedlit(Seq.empty[String]), 4).as("mh_empty"),
          graft.functions.Sketches.wordShingles(
            split(col("text"), " "), 2).as("sh2"),
          graft.functions.Sketches.winnowFingerprints(
            graft.functions.Sketches.wordShingles(
              split(col("text"), " "), 2), 2).as("wf"),
          graft.functions.Sketches.cdcBoundaries(
            graft.functions.Sketches.wordShingles(
              split(col("text"), " "), 2), 2).as("cb"))
        .collect()(0)
      assert(r.getAs[Seq[Long]]("mh").length === 8)
      assert(r.isNullAt(r.fieldIndex("mh_empty"))) // null-on-empty via codegen path
      assert(r.getSeq[Long](r.fieldIndex("wf")).nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("IvfPq + keyHash120 expressions survive CODEGEN_ONLY (values pinned)") {
    import graft.functions.{IvfPq, IvfPqKernels, Sketches}
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val vec = (0 until 64).map(i => (i - 32) / 40.0f)
      val r = Seq((1L, vec)).toDF("id", "vec")
        .select(IvfPq.gridQuant(col("vec")).as("cv"),
          Sketches.keyHash120(lit("probe")).as("hh"))
        .select(col("cv"), col("hh"),
          IvfPq.ivfCell(col("cv")).as("cid"),
          IvfPq.ivfScores(col("cv")).as("sc"))
        .select(col("cv"), col("hh"), col("cid"), col("sc"),
          IvfPq.ivfResidual(col("cv"), col("cid")).as("rv"))
        .select(col("hh"), col("cid"), col("sc"), col("rv"),
          IvfPq.pqEncode(col("rv")).as("codes"))
        .select(col("hh"), col("cid"), col("sc"), col("codes"),
          IvfPq.pqAdc(col("rv"), col("codes")).as("d"))
        .collect()(0)
      val cid = r.getLong(r.fieldIndex("cid"))
      val sc = r.getSeq[Long](r.fieldIndex("sc"))
      // cell == first argmax of the scores array (the declarative
      // array_position(sc, array_max(sc)) convention)
      assert(sc.length === 16)
      assert(cid === sc.indexOf(sc.max) + 1)
      assert(r.getSeq[Long](r.fieldIndex("codes")).length === 8)
      assert(r.getLong(r.fieldIndex("d")) >= 0L)
      // grid table matches the query-side IvfPqGrid derivation
      assert(IvfPqKernels.Grid.map(_.toSeq).toSeq ===
        graft.queries.VectorQueries.IvfPqGrid.map(_.toSeq).toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("denseLongArray matches the map_from_entries + transform reference") {
    // the declarative formulation bloomFilterRow used before the kernel
    // (interpreted O(entries x size) densify); values must be identical
    val df = Seq(
      (Seq((0L, 7L), (3L, -1L), (7L, Long.MaxValue))), // sparse, edges
      (Seq.empty[(Long, Long)])                        // no entries: all zeros
    ).toDF("es")
      .select(col("es"), transform(col("es"),
        e => struct(e("_1").as("w"), e("_2").as("b"))).as("entries"))
    val want = df.select(transform(sequence(lit(0L), lit(7L)),
        i => coalesce(element_at(
          map_from_entries(col("entries")), i), lit(0L))).as("a"))
      .as[Seq[Long]].collect().toSeq
    val got = df.select(
        graft.functions.Sketches.denseLongArray(col("entries"), 8).as("a"))
      .as[Seq[Long]].collect().toSeq
    assert(got === want)
    // codegen-only pin: the kernel must never fall back to interpreted
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val r = df.select(
          graft.functions.Sketches.denseLongArray(col("entries"), 8).as("a"))
        .as[Seq[Long]].collect().toSeq
      assert(r === want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // bloomFilterRow end-to-end: one row, words zeros-filled
    val bloom = graft.functions.Decontaminate.bloomFilterRow(
        Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"),
        "text", n = 2, mBits = 256, k = 3)
      .as[Seq[Long]].collect()
    assert(bloom.length === 1 && bloom(0).length === 8)
    assert(bloom(0).exists(_ != 0L)) // some bits set
  }

  test("denseLongArray rejects null entries and null fields loudly") {
    // a null idx/value must never silently read as 0 (it would clobber
    // word 0's real bits) and a null struct element must not NPE — both
    // throw descriptive errors instead
    val nullField = Seq((Seq((0L, 7L)), 1))
      .toDF("es", "tag")
      .select(transform(col("es"), e => struct(
        when(col("tag") === 99, e("_1")).as("w"),   // always-null long
        e("_2").as("b"))).as("entries"))
    val exField = intercept[Exception] {
      nullField.select(
        graft.functions.Sketches.denseLongArray(col("entries"), 8))
        .collect()
    }
    assert(exField.getMessage.contains("dense_long_array"))
    val nullEntry = Seq(1).toDF("tag")
      .select(array(when(col("tag") === 99,
        struct(lit(0L).as("w"), lit(1L).as("b")))).as("entries"))
    val exEntry = intercept[Exception] {
      nullEntry.select(
        graft.functions.Sketches.denseLongArray(col("entries"), 8))
        .collect()
    }
    assert(exEntry.getMessage.contains("dense_long_array"))
  }

  test("sketch plans are shuffle-free single-stage projects") {
    val docs = graft.engine.Tables.load(spark, Sf, "documents")
    val plan = Dedup.withSimHash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash plan shuffles:\n$plan")
    val planMh = Dedup.withMinHashSignature(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!planMh.contains("Exchange"), s"minhash plan shuffles:\n$planMh")
  }
}
