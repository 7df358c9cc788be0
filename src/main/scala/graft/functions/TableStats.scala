package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics collection — the per-column
  * null-count / NDV / min / max profile an optimizer keeps for join
  * planning and a pipeline keeps for data validation (schema drift, key
  * uniqueness, out-of-range values). The reference has no stats surface;
  * this is the engine-side primitive its journal tables would feed.
  */
object TableStats {

  /** Per-column stats for `cols`, in two passes over the (column-pruned)
    * scan:
    *
    *   1. typed min/max + null counts + row count — plain aggregates,
    *      one partial-aggregating pass, one row out. min/max run on the
    *      ORIGINAL type (then render to string), so `l_orderkey`'s max
    *      is numeric, not lexicographic.
    *   2. exact NDV via unpivot: `stack` each row into (col_name,
    *      native value) pairs, distinct-count per col_name as TWO
    *      partial-aggregating groupBys — (name, value) then (name).
    *
    * The earlier one-pass form used N `countDistinct` aggregates in one
    * `agg`, which Catalyst plans as an Expand producing N+1 copies of
    * every row into a single global aggregate keyed on ALL N columns at
    * once — measured 5× slower than this shape at sf0.1. Here each stage
    * map-side combines: stage-2's first agg emits at most NDV rows per
    * partition per column, and the scan is read once per column TYPE
    * GROUP (usually 2–3), each pruned to exactly that group's columns
    * (IO is the cheap part; the distinct is the cost).
    *
    * NDV is EXACT (count distinct), deliberately: the result is
    * oracle-checkable, and at 100 TB the same shape runs with
    * `approx_count_distinct` swapped in (one-line change, HLL partial
    * aggregation — the `q_approx_distinct` family already covers that
    * path). NDV counts distinct NATIVE values — the stack-unpivot runs
    * once per column TYPE GROUP (stack needs homogeneous value columns),
    * so a double column counts -0.0/0.0 and shortest-repr collisions
    * exactly as an engine counting native values would, never through a
    * string canonicalization. Min/max DO render via a string cast (the
    * ANALYZE convention of a heterogeneous stats row) — canonical for
    * integer/string/date columns and for doubles whose values render
    * identically across engines (integral doubles like quantities);
    * timestamp columns are REJECTED outright, engines disagree on
    * second-fraction rendering.
    *
    * Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val bad = cols.filter { c =>
      byName.get(c).exists(t =>
        t.typeName == "timestamp" || t.typeName == "timestamp_ntz")
    }
    require(bad.isEmpty,
      s"columnStats cannot profile timestamp columns (min/max " +
        s"second-fraction rendering is engine-specific): ${bad.mkString(", ")}")
    val pruned = df.select(cols.map(col): _*)
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    val basics = pruned.agg(count(lit(1)).as("__n"), aggs: _*)
      .selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, min_val, max_val)")
    // one unpivot per type group, NATIVE values (no canonicalizing cast)
    val ndv = cols.groupBy(c => byName(c).typeName).values.toSeq
      .map { gcols =>
        val unpivot = gcols.map(c => s"'$c', `$c`").mkString(", ")
        pruned.select(gcols.map(col): _*)
          .selectExpr(s"stack(${gcols.length}, $unpivot) AS (col_name, __v)")
          .groupBy(col("col_name"), col("__v")).agg(count(lit(1)).as("__c"))
          .groupBy(col("col_name"))
          .agg(sum(when(col("__v").isNotNull, 1L).otherwise(0L))
            .as("n_distinct"))
      }.reduce(_ unionByName _)
    basics.join(ndv, Seq("col_name"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Referential-integrity audit over a set of foreign-key edges — the
    * cross-table validation a pipeline runs before trusting a snapshot
    * (a non-zero orphan count means a parent purge, a partial load, or
    * an out-of-order ingest). One row per edge: child rows, NULL
    * foreign keys (excluded from the orphan check — SQL FK semantics),
    * orphans (non-null keys with no parent), and the orphan rate.
    *
    * Scale shape: per edge, one aggregate over the child's pruned key
    * column plus one LEFT ANTI join of the child key against the
    * DISTINCT parent key — the anti-join shuffles on the key (AQE
    * broadcasts genuinely small parents), and the distinct
    * partial-aggregates, so a hot parent key never concentrates. The
    * per-edge 1-row frames cross-join and union driver-trivially.
    */
  def fkOrphans(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "need at least one FK edge")
    edges.map { case (label, child, childKey, parent, parentKey) =>
      val tot = child.agg(
        count(lit(1)).as("n_child"),
        sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_fk"))
      val orph = child.select(col(childKey))
        .filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      tot.crossJoin(orph).select(
        lit(label).as("fk_edge"), col("n_child"), col("n_null_fk"),
        col("n_orphans"),
        (col("n_orphans").cast("double") / col("n_child").cast("double"))
          .as("orphan_rate"))
    }.reduce(_ unionByName _)
  }

  /** Dictionary-encoding advisor — the storage-layout estimate a
    * lakehouse writer makes per string column: plain size (Σ value
    * bytes over non-null rows) vs dictionary size (Σ DISTINCT value
    * bytes + one ⌈log₂ ndv⌉-bit code per row, byte-rounded). All
    * integer arithmetic: the bit width is a CASE chain (no float log),
    * the byte rounding is `(rows·bits + 7) div 8`, so the verdict is
    * oracle-exact. At 100 TB this is how you decide sort orders and
    * column encodings BEFORE rewriting a petabyte — the reasoning
    * parquet writers apply per row group, surfaced as a queryable
    * report.
    *
    * Scale shape: per table, one stack-unpivot over the pruned string
    * columns into two partial-aggregating groupBys — (col, value) then
    * (col); nothing concentrates. Nulls cost zero bytes in either
    * encoding and are excluded.
    */
  def encodingAdvisor(
      tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    tables.map { case (label, df, cols) =>
      require(cols.nonEmpty, s"need at least one column for $label")
      val unpivot = cols.map(c => s"'$c', `$c`").mkString(", ")
      val perValue = df.select(cols.map(col): _*)
        .selectExpr(s"stack(${cols.length}, $unpivot) AS (col_name, __v)")
        .filter(col("__v").isNotNull)
        .groupBy(col("col_name"), col("__v"))
        .agg(count(lit(1)).as("__c"))
      val per = perValue.groupBy(col("col_name"))
        .agg(sum(col("__c")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          sum(octet_length(col("__v")) * col("__c")).as("plain_bytes"),
          sum(octet_length(col("__v"))).as("dict_value_bytes"))
      val bits = (1 to 40).foldLeft(
        when(col("n_distinct") <= 1L, lit(0L))) { (acc, k) =>
        acc.when(col("n_distinct") <= (1L << k), lit(k.toLong))
      }.otherwise(lit(41L))
      per.withColumn("dict_bits", bits)
        .withColumn("est_dict_bytes", col("dict_value_bytes") +
          expr("(n_rows * dict_bits + 7) DIV 8"))
        .select(lit(label).as("tbl"), col("col_name"), col("n_rows"),
          col("n_distinct"), col("plain_bytes"), col("dict_bits"),
          col("est_dict_bytes"),
          (col("est_dict_bytes") < col("plain_bytes")).as("dict_wins"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB mirror of one [[encodingAdvisor]] table entry. */
  def encodingAdvisorSql(label: String, table: String,
      cols: Seq[String]): String = {
    val bitsCase = (1 to 40)
      .map(k => s"WHEN n_distinct <= ${1L << k} THEN $k")
      .mkString(" ")
    val perCol = cols.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(SUM(octet_length(encode(v)) * c) AS BIGINT) AS plain_bytes,
         |  CAST(SUM(octet_length(encode(v))) AS BIGINT) AS dict_value_bytes
         |FROM (SELECT $c AS v, CAST(COUNT(*) AS BIGINT) AS c
         |      FROM $table WHERE $c IS NOT NULL GROUP BY $c)""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""SELECT '$label' AS tbl, col_name, n_rows, n_distinct, plain_bytes,
       |  dict_bits, est_dict_bytes, est_dict_bytes < plain_bytes AS dict_wins
       |FROM (
       |  SELECT *,
       |    CAST(CASE WHEN n_distinct <= 1 THEN 0 $bitsCase ELSE 41 END
       |      AS BIGINT) AS dict_bits,
       |    CAST(dict_value_bytes +
       |      (n_rows * (CASE WHEN n_distinct <= 1 THEN 0 $bitsCase
       |                 ELSE 41 END) + 7) // 8 AS BIGINT) AS est_dict_bytes
       |  FROM ($perCol))""".stripMargin
  }
}
