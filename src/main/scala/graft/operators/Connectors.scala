package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.v2.SeqSource

/** Connector-surface operators: queries answered by the DataSource V2
  * connector's pushdown machinery rather than by row scans.
  */
object Connectors {

  // ---------------------------------------------------------------- q200

  /** COMPLETE DSv2 aggregate pushdown: count/min/max/sum(id) per bucket over
    * the synthetic-sequence connector, with an id-range filter that the
    * connector consumed by clipping its planned splits. The physical plan has
    * NO Spark-side aggregate — the scan answers arithmetically from the
    * clipped range (SeqSource.SeqAggScan), the way a production connector
    * answers count(*) from file-footer/manifest metadata instead of data.
    * The oracle recomputes the same aggregates over DuckDB's range()
    * generator — pure integer arithmetic, bit-identical.
    */
  def q200PushedAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[SeqSource].getName)
      .option("rows", "200000").option("parts", "8").load()
      .where(col("id") >= 12345L && col("id") < 180000L)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        sum(col("id")).as("sum_id"))
      .orderBy(col("bucket"))

  val q200Oracle: String =
    """SELECT CAST(id % 32 AS INT) AS bucket, count(*) AS n,
      |  min(id) AS min_id, max(id) AS max_id, CAST(sum(id) AS BIGINT) AS sum_id
      |FROM (SELECT range AS id FROM range(12345, 180000))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q204

  /** Three-part-name SQL through the [[graft.sources.catalog.GraftCatalog]]
    * V2 catalog: the scale-factor directory is mounted as a namespace and the
    * star-schema join runs against `graft_cat.<sf>.orders` /
    * `graft_cat.<sf>.customer` — no temp views, no paths in the query text.
    * `loadTable` hands back Spark's native ParquetTable, so the catalog route
    * keeps vectorized scans, filter pushdown, and column pruning; the plan is
    * identical to the path-based q03-style join (broadcast dim, one shuffle).
    */
  def q204CatalogSql(spark: SparkSession, dir: String): DataFrame = {
    // Hadoop Path resolution (not java.io.File): the mount root must stay
    // portable to any FileSystem scheme the catalogs speak, and
    // makeQualified is the FS-correct absolutization.
    val raw = new org.apache.hadoop.fs.Path(dir)
    val d = raw.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(raw)
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root", d.getParent.toUri.getPath)
    val ns = d.getName
    spark.sql(
      s"""SELECT c_mktsegment AS seg, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
         |FROM graft_cat.`$ns`.orders
         |JOIN graft_cat.`$ns`.customer ON o_custkey = c_custkey
         |WHERE o_orderstatus = 'O'
         |GROUP BY c_mktsegment
         |ORDER BY seg""".stripMargin)
  }

  val q204Oracle: String =
    s"""SELECT c_mktsegment AS seg, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE o_orderstatus = 'O'
       |GROUP BY c_mktsegment ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- q231

  /** DSv2 SINK round-trip through the two-phase commit protocol
    * ([[graft.sources.v2.MemSink]]): a filtered projection of `customer` is
    * written via task commit messages + atomic driver commit
    * (mode("overwrite") exercising TRUNCATE), read back through the same
    * provider with column pruning, and aggregated. The oracle aggregates
    * the source table directly — a hash-match proves write→commit→read is
    * lossless. This is the commit-semantics analogue of q45's file
    * round-trip, expressed through the modern connector API instead of
    * rename-as-commit (the reference's copy+delete hazard,
    * CephRgwFileSystem.java:310-313). MemSinkSpec proves the abort side:
    * a failed job leaves no partial table.
    */
  def q231SinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.v2.MemSink
    graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      .where(col("c_custkey") % 3 === 0)
      .write.format(classOf[MemSink].getName).option("name", "q231_cust_copy")
      .mode("overwrite").save()
    spark.read.format(classOf[MemSink].getName).option("name", "q231_cust_copy").load()
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("bal_cents")).as("sum_cents"),
        min(col("c_custkey")).as("min_key"))
      .orderBy(col("c_mktsegment"))
  }

  val q231Oracle: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  min(c_custkey) AS min_key
      |FROM customer WHERE c_custkey % 3 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q232

  /** Storage-partitioned join (SPJ) over the connector's bucket layout:
    * both sides report `KeyGroupedPartitioning(identity(bucket))` with one
    * keyed split per bucket ([[graft.sources.v2.SeqBucketScan]]), so with
    * `spark.sql.sources.v2.bucketing.enabled` the per-bucket aggregates AND
    * the bucket⋈bucket join plan with ZERO Exchange — Spark trusts the
    * source's physical clustering instead of re-shuffling it (the
    * Iceberg-style SPJ surface; SeqSourceSpec asserts the exchange-free
    * plan). At 100 TB this is the difference between a metadata no-op and
    * shuffling both fact tables: co-located storage buckets make the join
    * embarrassingly parallel. The oracle recomputes both sides from
    * DuckDB's range() generator — pure integer arithmetic.
    */
  def q232SpjBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def bucketed(rows: Long) =
      spark.read.format(classOf[SeqSource].getName)
        .option("rows", rows.toString).option("layout", "bucket").load()
    val a = bucketed(100000L).groupBy(col("bucket"))
      .agg(count(lit(1)).as("na"), sum(col("id")).as("sa"))
    val b = bucketed(200000L).groupBy(col("bucket"))
      .agg(max(col("id")).as("mb"), sum(col("id")).as("sb"))
    a.join(b, "bucket")
      .select(col("bucket"), col("na"), col("sa"), col("mb"), col("sb"))
      .orderBy(col("bucket"))
  }

  val q232Oracle: String =
    """WITH a AS (
      |  SELECT CAST(range % 32 AS INT) AS bucket, count(*) AS na,
      |    CAST(sum(range) AS BIGINT) AS sa
      |  FROM range(0, 100000) GROUP BY 1),
      |b AS (
      |  SELECT CAST(range % 32 AS INT) AS bucket, max(range) AS mb,
      |    CAST(sum(range) AS BIGINT) AS sb
      |  FROM range(0, 200000) GROUP BY 1)
      |SELECT a.bucket, na, sa, mb, sb
      |FROM a JOIN b ON a.bucket = b.bucket
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q241

  /** Per-JVM staging-catalog root (same isolation rationale as
    * FsParity.scratchRoot: concurrent drivers never collide; within a JVM a
    * re-run drops and recreates its own table).
    */
  private lazy val stageRoot: String =
    java.nio.file.Files.createTempDirectory("graft_stagecat_").toString

  /** Catalog-addressed WRITE path through the writable V2 staging catalog
    * ([[graft.sources.catalog.GraftStagingCatalog]]): `CREATE TABLE AS
    * SELECT` materializes a filtered slice of `orders` as a catalog table,
    * `INSERT INTO` appends a second disjoint slice, and the final aggregate
    * reads the table back through its three-part name. Writes run Spark's
    * real DSv2 file-write committer (task-attempt staging + job commit), so
    * this closes the reference's create/write surface
    * (`CephRgwFileSystem.java:216-289`, `CephRgwOutputStream.java:35-63`)
    * that the read-only corpus catalog (q204) deliberately refuses. The
    * oracle recomputes the union of both slices straight from `orders` — a
    * hash match proves CTAS + INSERT + catalog read-back are lossless.
    */
  def q241CatalogWrite(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_stage_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.seg_orders")
    spark.sql(
      """CREATE TABLE graft_stage.work.seg_orders AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_stage_src WHERE o_orderkey % 10 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.seg_orders
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_stage_src WHERE o_orderkey % 10 = 3""".stripMargin)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.seg_orders
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q241Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (0, 3)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q246

  /** Persistent IVF vector index as a catalog table — the serving-side
    * pattern a 100 TB pipeline actually runs: cell assignments are
    * materialized ONCE (CTAS through the staging catalog's real DSv2
    * committer), new embeddings arrive later as an incremental INSERT of
    * already-assigned rows, and probes are an equi-join against the
    * catalog table — no re-embedding, no re-assignment of the standing
    * corpus per query. Composes the writable catalog (q241) with the IVF
    * family (q67/q216): the initial load indexes vec_id % 10 != 7, the
    * upsert adds the % 10 == 7 slice, and the probe (same top-3-per-query
    * join as q67, nprobe=1) reads ONLY the catalog table. The oracle is
    * q67's: after the upsert the persisted index covers the full corpus,
    * so a hash match proves CTAS + incremental INSERT + catalog read-back
    * reproduce the in-flight ANN bit-for-bit (and therefore q216's
    * measured recall). At scale the table would be partitioned by cell so
    * probes prune to nprobe partitions.
    */
  /** Build-once guard for the persisted IVF index shared by q246 and q278:
    * a serving index is built by ingestion and probed by MANY queries, so
    * the two probe faces (nprobe=1 and nprobe=2) deliberately share one
    * physical table — the same shared-artifact discipline as the
    * q33/q137/q239/q240 pair-intersection family.
    */
  private val ivfIndexReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureIvfIndex(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    ivfIndexReady.computeIfAbsent(s"$stageRoot|$dir", _ => {
      val base = Similarity.withNorm(spark, dir)
      // quantizer is fixed (trained offline); assignment is map-only per slice
      val cents = Similarity.ivfCentroids(base).localCheckpoint()
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.ivf_index")
      Similarity.ivfAssign(base.where(col("vec_id") % 10 =!= 7), cents)
        .createOrReplaceTempView("ivf_initial_load")
      spark.sql("CREATE TABLE graft_stage.work.ivf_index AS SELECT * FROM ivf_initial_load")
      Similarity.ivfAssign(base.where(col("vec_id") % 10 === 7), cents)
        .createOrReplaceTempView("ivf_upsert_batch")
      spark.sql("INSERT INTO graft_stage.work.ivf_index SELECT * FROM ivf_upsert_batch")
      "built"
    })
  }

  def q246IvfCatalogIndex(spark: SparkSession, dir: String): DataFrame = {
    ensureIvfIndex(spark, dir)
    Similarity.ivfProbe(spark.table("graft_stage.work.ivf_index"))
  }

  /** PQ artifacts as catalog tables, built ONCE per (root, corpus) beside
    * the IVF index — codes for every vector and the 16-entry codebook.
    * Both derive from the ivf_index table itself (it stores the
    * embeddings), so even the BUILD never re-reads the raw corpus files;
    * serving (q303) touches only these three catalog tables. This closes
    * the round-7 gap where q264 recomputed codes per run: at 100 TB the
    * index stores 8 one-byte codes + a cell id per vector and the float
    * payload is needed at neither index time nor query time.
    */
  private val pqIndexReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensurePqIndex(spark: SparkSession, dir: String): Unit = {
    ensureIvfIndex(spark, dir)
    pqIndexReady.computeIfAbsent(s"$stageRoot|$dir", _ => {
      val idx = spark.table("graft_stage.work.ivf_index")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.pq_codebook")
      idx.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cent"))
        .createOrReplaceTempView("pq_codebook_load")
      spark.sql("CREATE TABLE graft_stage.work.pq_codebook AS SELECT * FROM pq_codebook_load")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.pq_codes")
      // codes lifecycle mirrors the cells': initial load, then an
      // incremental INSERT of the late slice — both from the index table
      val book = spark.table("graft_stage.work.pq_codebook")
      Similarity.pqCodes(Similarity.pqSubDistsAgainst(
        idx.where(col("vec_id") % 10 =!= 7).select(col("vec_id"), col("embedding")), book))
        .createOrReplaceTempView("pq_codes_load")
      spark.sql("CREATE TABLE graft_stage.work.pq_codes AS SELECT * FROM pq_codes_load")
      Similarity.pqCodes(Similarity.pqSubDistsAgainst(
        idx.where(col("vec_id") % 10 === 7).select(col("vec_id"), col("embedding")), book))
        .createOrReplaceTempView("pq_codes_upsert")
      spark.sql("INSERT INTO graft_stage.work.pq_codes SELECT * FROM pq_codes_upsert")
      // COMMIT GROUP (r11): the serving trio (cells, codebook, codes)
      // becomes readable as ONE vector — codes decoded against a stale
      // codebook are silent garbage, so a crash anywhere in this build
      // must leave readers on the previous consistent trio, not a mix
      spark.sql( // binds the just-built heads as the group's first vector
        "CALL graft_stage.group_create('work', 'pq_serving', 'ivf_index,pq_codebook,pq_codes')")
      "built"
    })
  }

  // ---------------------------------------------------------------- q303

  /** IVF-PQ served WHOLLY from persisted catalog tables — the FAISS-parity
    * endgame (closes round-7 next-step #2): cells + embeddings from
    * `ivf_index` (q246), codes from `pq_codes`, codebook from
    * `pq_codebook`; the raw embeddings files are read by NOTHING in this
    * plan (PlanSpec asserts it) and the codes are NOT rebuilt per run
    * (they were committed once, incrementally, by [[ensurePqIndex]]). Per
    * query: the 128-entry distance table is recomputed from the query's
    * own stored embedding against the broadcast codebook (the one piece
    * that is inherently per-query — 20×128 rows), candidates come from
    * the IVF cell equi-join, and each candidate costs 8 code lookups.
    * Hash-matched against q264's oracle: the persisted serving path is
    * bit-identical to the in-flight build.
    */
  def q303IvfPqServe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensurePqIndex(spark, dir)
    val idx = spark.table("graft_stage.work.ivf_index")
    val codes = spark.table("graft_stage.work.pq_codes")
    val book = spark.table("graft_stage.work.pq_codebook")
    val queries = idx.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("cell").as("q_cell"))
    val dtab = broadcast(Similarity.pqSubDistsAgainst(
        idx.where(col("vec_id") < 20).select(col("vec_id"), col("embedding")), book)
      .select(col("vec_id").as("dq_id"), col("m").as("qm"),
        col("cid").as("qcid"), col("d2").as("qd2")))
    val wTop = Window.partitionBy(col("q_id")).orderBy(asc("adc"), asc("neighbor_id"))
    idx.select(col("vec_id").as("neighbor_id"), col("cell"))
      .join(queries, col("cell") === col("q_cell") && col("neighbor_id") =!= col("q_id"))
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(dtab, col("q_id") === col("dq_id") && col("m") === col("qm") &&
        col("code") === col("qcid"))
      .groupBy(col("q_id"), col("cell"), col("neighbor_id"))
      .agg(expr("aggregate(array_sort(collect_list(struct(m, qd2))), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v.qd2)").as("adc"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("cell"), col("neighbor_id"), col("adc"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  // ---------------------------------------------------------------- q278

  /** nprobe=2 against the PERSISTED IVF index — q84's recall/cost dial
    * composed with q246's catalog-table serving path. EVERYTHING the probe
    * touches comes from the catalog table: the quantizer is re-read from
    * the index rows (vec_id < 8 — the same fixed centroids ingestion
    * assigned with), each query fans out to its TWO nearest cells
    * (broadcast centroid ranking, map-only), and candidate generation is
    * the equi-join on the cell id against the index table only — the
    * source embeddings are never re-scanned (PlanSpec asserts it). Since
    * nprobe=2's candidate set is a superset of nprobe=1's per query, its
    * recall dominates q246's by construction — the audit test pins it.
    * Hash-matched against q84's in-flight oracle: the persisted path at
    * nprobe=2 is bit-identical to the in-flight dial.
    */
  def q278IvfCatalogNprobe2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureIvfIndex(spark, dir)
    val idx = spark.table("graft_stage.work.ivf_index")
    val cents = idx.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(asc("dist2"), asc("c_id"))
    val queries = idx.where(col("vec_id") < 20)
      .crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("c_id").as("q_cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    idx.join(queries, col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("cell"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  // ---------------------------------------------------------------- q279

  /** Event-time zone maps — the hottest real-world pruning key: the events
    * table is staged into the catalog, CLUSTER BY ts rewrites it into
    * files with disjoint [min,max] event-time ranges, ANALYZE harvests
    * TIMESTAMP footer stats (normalized to MICROS whatever the file's
    * physical unit), and a one-day slice reads only the files whose range
    * intersects it ([[graft.sources.catalog.StagingMaintenance.prunedScan]]
    * — CatalogSpec proves ≤2 of 8 files for an hour slice). At 100 TB
    * this is the dominant access pattern: "yesterday's events" must open
    * yesterday's objects, not list-and-scan a month. The oracle recomputes
    * the slice aggregate straight from the source — a hash match proves
    * stage→cluster→analyze→prune loses no row of the window and adds none.
    */
  def q279TsZoneMapSlice(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    // stage with µs-physical timestamps so footers carry LongStatistics
    // (INT96 has no usable ordering stats)
    val prevT = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_tsz_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_tsz")
      spark.sql(
        """CREATE TABLE graft_stage.work.events_tsz AS
          |SELECT event_id, ts, user_id, event_type, value FROM events_tsz_src""".stripMargin)
      graft.sources.catalog.StagingMaintenance.optimize(
        spark, "graft_stage", "work", "events_tsz", targetFiles = 8, clusterBy = Some("ts"))
      graft.sources.catalog.StagingMaintenance.analyze(
        spark, "graft_stage", "work", "events_tsz", Seq("ts"))
      // one day of a one-month corpus, in µs since epoch (the sidecar scale)
      val lo = java.time.Instant.parse("2024-01-10T00:00:00Z").getEpochSecond * 1000000L
      val hi = java.time.Instant.parse("2024-01-11T00:00:00Z").getEpochSecond * 1000000L - 1L
      val (scan, _, _) = graft.sources.catalog.StagingMaintenance.prunedScan(
        spark, "graft_stage", "work", "events_tsz", "ts", lo, hi)
      scan.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_ev"), max(col("event_id")).as("max_ev"),
          graft.operators.Det.dsum(col("value")).as("total"))
        .orderBy(col("event_type"))
    } finally {
      prevT match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  val q279Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
       |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11 00:00:00'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q284

  /** FILE-GRANULAR SQL DELETE — GDPR/retention erasure at object-store
    * scale: events staged and CLUSTER BY ts, event-time zone maps analyzed,
    * then `DELETE WHERE ts ∈ [day10, day11)` rides the metadata fast path,
    * which uses the per-file [min,max] ranges to REWRITE ONLY the files the
    * day can live in — every other file carries into the new version by
    * name (GraftStagingCatalog.deleteWhere; CatalogSpec proves ≥6 of 8
    * files untouched). On a 100 TB month-clustered table, deleting one day
    * rewrites ~1/30th of the objects instead of the table — the
    * Delta/Iceberg copy-on-write shape with none of either's metadata
    * format. The oracle recomputes the survivors straight from the source:
    * a hash match proves the partial rewrite dropped exactly the day and
    * nothing else.
    */
  def q284FileGranularDelete(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    val prevT = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_fgd_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_fgd")
      // CTAS shaped at write time (REPARTITION_BY_RANGE = the clustered
      // layout in ONE read+write): file-level zone maps need disjoint
      // per-file ranges, which range partitioning alone provides — a
      // separate OPTIMIZE pass would re-read and re-write the whole table
      // for the same file-granular pruning (the r8 lifecycle-cost lesson)
      spark.sql(
        """CREATE TABLE graft_stage.work.events_fgd AS
          |SELECT /*+ REPARTITION_BY_RANGE(8, ts) */
          |  event_id, ts, user_id, event_type, value FROM events_fgd_src""".stripMargin)
      graft.sources.catalog.StagingMaintenance.analyze(
        spark, "graft_stage", "work", "events_fgd", Seq("ts"))
      spark.sql(
        """DELETE FROM graft_stage.work.events_fgd
          |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-11 00:00:00'""".stripMargin)
      spark.table("graft_stage.work.events_fgd")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_ev"), max(col("event_id")).as("max_ev"),
          graft.operators.Det.dsum(col("value")).as("total"))
        .orderBy(col("event_type"))
    } finally {
      prevT match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  val q284Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
       |       AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11 00:00:00')
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q285

  /** STRING zone maps through the PLAIN SQL scan: documents staged into
    * the catalog, CLUSTER BY lang (a string key — the corpus-partitioning
    * reality of multilingual pipelines), ANALYZE harvesting UTF-8 min/max
    * string stats from the parquet footers, and then an ordinary
    * `SELECT … WHERE lang = 'de'` — no side API — skips every file whose
    * recorded [min,max] range cannot contain 'de'
    * ([[graft.sources.catalog.ZoneMapScanBuilder]] wraps the table's
    * DSv2 ScanBuilder; CatalogSpec asserts filesKept < filesTotal through
    * the `ZoneMapScan.lastPrune` hook). This is per-language corpus
    * routing as metadata: at 100 TB "give me the German slice" opens the
    * German objects, not the corpus. Hash-matched against the source-side
    * aggregate — pruning changed which files were read, never the answer.
    */
  def q285StringZonemap(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.documents(spark, dir).createOrReplaceTempView("docs_szm_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.docs_szm")
    spark.sql(
      """CREATE TABLE graft_stage.work.docs_szm AS
        |SELECT doc_id, lang, source, n_chars FROM docs_szm_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "docs_szm", targetFiles = 5, clusterBy = Some("lang"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "docs_szm", Seq("lang"))
    spark.sql(
      """SELECT source, count(*) AS n, min(doc_id) AS min_doc,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM graft_stage.work.docs_szm WHERE lang = 'de'
        |GROUP BY source ORDER BY source""".stripMargin)
  }

  val q285Oracle: String =
    """SELECT source, count(*) AS n, min(doc_id) AS min_doc,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'de'
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q292

  /** The ALL-SQL table-management lifecycle — Spark 4's DSv2 stored
    * procedures ([[graft.sources.catalog.StagingProcedures]], SQL `CALL`)
    * composed with plain-scan zone maps: stage events with CTAS, compact +
    * cluster on event time with `CALL optimize`, harvest TIMESTAMP stats
    * with `CALL analyze`, then answer a day slice with an ORDINARY
    * `SELECT … WHERE ts BETWEEN …` — whose DSv2 scan consults the stats
    * sidecar and skips non-intersecting files with no side API anywhere.
    * A user never leaves SQL: DDL, DML, maintenance, and pruned reads are
    * one surface, the way a reference deployment would actually operate
    * the catalog. The oracle recomputes the slice from the source — the
    * SQL-driven lifecycle loses nothing and adds nothing.
    */
  def q292SqlMaintenance(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    val prevT = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_sqlm_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_sqlm")
      spark.sql(
        """CREATE TABLE graft_stage.work.events_sqlm AS
          |SELECT event_id, ts, user_id, event_type, value FROM events_sqlm_src""".stripMargin)
      spark.sql("CALL graft_stage.optimize('work', 'events_sqlm', 8, 'ts')")
      spark.sql("CALL graft_stage.analyze('work', 'events_sqlm', 'ts')")
      spark.sql(
        """SELECT event_type, count(*) AS n, min(event_id) AS min_ev,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM graft_stage.work.events_sqlm
          |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-21 00:00:00'
          |GROUP BY event_type ORDER BY event_type""".stripMargin)
    } finally {
      prevT match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  val q292Oracle: String =
    s"""SELECT event_type, count(*) AS n, min(event_id) AS min_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00'
       |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-21 00:00:00'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q248

  /** Snapshot-pinned (time-travel) read over the staging catalog: three
    * commits build the table (CTAS then two INSERTs), and the query compares
    * the CURRENT aggregate against the same aggregate computed `VERSION AS
    * OF 1` — the commit-manifest mechanism
    * ([[graft.sources.catalog.GraftStagingCatalog]]: every committed DSv2
    * batch write records `_graft_versions/v<N>.json`; append-only tables
    * keep every manifest's file set readable forever). This is the
    * reproducible-training primitive a 100 TB corpus pipeline needs: a run
    * pins the corpus version it trained on and re-reads that exact file set
    * while ingestion keeps appending. The oracle recomputes both snapshots
    * from `orders` by the slice predicates — a hash match proves the v1
    * manifest reads back EXACTLY the first commit, not merely some subset.
    */
  def q248TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_tt_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_v")
    spark.sql( // commit 1
      """CREATE TABLE graft_stage.work.orders_v AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tt_src WHERE o_orderkey % 10 = 1""".stripMargin)
    spark.sql( // commit 2
      """INSERT INTO graft_stage.work.orders_v
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tt_src WHERE o_orderkey % 10 = 4""".stripMargin)
    spark.sql( // commit 3
      """INSERT INTO graft_stage.work.orders_v
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tt_src WHERE o_orderkey % 10 = 8""".stripMargin)
    spark.sql(
      """SELECT cur.status, coalesce(v1.n_v1, 0) AS n_v1, cur.n_now, cur.total_now
        |FROM (SELECT o_orderstatus AS status, count(*) AS n_now,
        |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_now
        |      FROM graft_stage.work.orders_v GROUP BY o_orderstatus) cur
        |LEFT JOIN (SELECT o_orderstatus AS status, count(*) AS n_v1
        |           FROM graft_stage.work.orders_v VERSION AS OF 1
        |           GROUP BY o_orderstatus) v1 USING (status)
        |ORDER BY status""".stripMargin)
  }

  val q248Oracle: String =
    s"""WITH v1 AS (SELECT o_orderstatus AS status, count(*) AS n_v1
       |            FROM orders WHERE o_orderkey % 10 = 1 GROUP BY 1),
       |cur AS (SELECT o_orderstatus AS status, count(*) AS n_now,
       |          ${graft.operators.Det.dsumSql("o_totalprice")} AS total_now
       |        FROM orders WHERE o_orderkey % 10 IN (1, 4, 8) GROUP BY 1)
       |SELECT cur.status, coalesce(v1.n_v1, 0) AS n_v1, cur.n_now, cur.total_now
       |FROM cur LEFT JOIN v1 USING (status)
       |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q250

  /** OPTIMIZE + VACUUM on a staging-catalog table
    * ([[graft.sources.catalog.StagingMaintenance]]): three small commits
    * build the table (the object-store small-file pile-up in miniature),
    * OPTIMIZE rewrites the current set into 2 compacted files as a new
    * version, a post-OPTIMIZE INSERT lands beside them (and must not
    * resurrect the originals — the manifest's ever-referenced exclusion),
    * and VACUUM drops all but the last two versions, deleting the
    * originals. The final aggregate reads the maintained table; the oracle
    * recomputes from `orders` directly — a hash match proves the whole
    * maintenance cycle is content-preserving. This is the catalog face of
    * the same hazard the SegmentedIndex compaction handles for streaming
    * state, and the operational pattern the reference's object-store
    * deployment lives by: many small commits, periodic rewrite, bounded
    * retention.
    */
  def q250OptimizeCompact(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_opt_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_opt")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_opt AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_opt_src WHERE o_orderkey % 4 = 0""".stripMargin)
    Seq(1, 2).foreach { s =>
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_opt
           |SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders_opt_src WHERE o_orderkey % 4 = $s""".stripMargin)
    }
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_opt", targetFiles = 2)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_opt
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_opt_src WHERE o_orderkey % 4 = 3""".stripMargin)
    graft.sources.catalog.StagingMaintenance.vacuum(
      spark, "graft_stage", "work", "orders_opt", retainLast = 2)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_opt
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q250Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q251

  /** Append-only change data feed over the versioned staging catalog
    * ([[graft.sources.catalog.StagingMaintenance.changesBetween]]): the
    * table builds in three commits, and the query reads ONLY the rows
    * added after version 1 — a manifest file-diff plus a scan of the new
    * files, never a row-level comparison or a full-table rescan. This is
    * how an incremental downstream consumer (index refresh, aggregate
    * maintenance, replication) tails a 100 TB corpus: remember the last
    * processed version, read forward. The oracle recomputes the delta
    * slices straight from `orders` — a hash match proves the file-diff
    * feed is exactly the added rows.
    */
  def q251ChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cdc_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_cdc")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_cdc AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cdc_src WHERE o_orderkey % 10 = 1""".stripMargin)
    Seq(4, 8).foreach { s =>
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_cdc
           |SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders_cdc_src WHERE o_orderkey % 10 = $s""".stripMargin)
    }
    graft.sources.catalog.StagingMaintenance
      .changesBetween(spark, "graft_stage", "work", "orders_cdc", 1L, 3L)
      .createOrReplaceTempView("orders_cdc_changes")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n_changed,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders_cdc_changes
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q251Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n_changed,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (4, 8)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q253

  /** Zone-map (file-level min/max) data skipping on a staging-catalog table
    * ([[graft.sources.catalog.StagingMaintenance.analyze]] /
    * [[graft.sources.catalog.StagingMaintenance.prunedScan]]): the table
    * builds in three commits covering disjoint o_orderkey ranges, ANALYZE
    * harvests per-file min/max from the parquet FOOTERS (metadata-only
    * positional reads — the access pattern the reference's
    * `CephRgwInputStream.read(position,…)` exists to make cheap on object
    * storage), and the range query reads ONLY files whose recorded range
    * intersects the predicate — the third commit's files are never opened
    * (CatalogSpec asserts filesRead < filesCurrent). The row-level filter
    * still applies on top: pruning is an optimization, never a semantics
    * change — which is exactly what the oracle's hash match proves.
    */
  def q253ZoneMapScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_zm_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_zm")
    spark.sql( // commit 1: low keyspace
      """CREATE TABLE graft_stage.work.orders_zm AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_zm_src WHERE o_orderkey < 500""".stripMargin)
    spark.sql( // commit 2: mid keyspace
      """INSERT INTO graft_stage.work.orders_zm
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_zm_src WHERE o_orderkey >= 500 AND o_orderkey < 1000""".stripMargin)
    spark.sql( // commit 3: high keyspace
      """INSERT INTO graft_stage.work.orders_zm
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_zm_src WHERE o_orderkey >= 1000""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_zm", Seq("o_orderkey"))
    val (scan, _, _) = graft.sources.catalog.StagingMaintenance.prunedScan(
      spark, "graft_stage", "work", "orders_zm", "o_orderkey", 400L, 800L)
    scan.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("status"))
  }

  val q253Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey BETWEEN 400 AND 800
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q256

  /** Incremental materialized-view maintenance off the change feed — the
    * consumer side of q251: a per-status aggregate (count + exact decimal
    * sum) is built ONCE from the `VERSION AS OF 1` snapshot, then advanced
    * to version 3 by merging in ONLY the delta rows
    * ([[graft.sources.catalog.StagingMaintenance.changesBetween]] — a
    * manifest file-diff plus a scan of the new files). Count and decimal-sum
    * are self-maintainable over append-only deltas, so
    * merged = base ⊌ agg(delta) equals the full recompute EXACTLY: decimal
    * addition is associative, so splitting the sum across base/delta cannot
    * change a bit. The oracle recomputes the aggregate over all three
    * slices from `orders` directly — a hash match proves the incremental
    * path is lossless. At 100 TB this is the difference between re-scanning
    * the corpus per refresh and touching only the day's new files.
    */
  def q256IncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_mv_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_mv")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_mv AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_mv_src WHERE o_orderkey % 10 = 2""".stripMargin)
    Seq(5, 9).foreach { s =>
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_mv
           |SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders_mv_src WHERE o_orderkey % 10 = $s""".stripMargin)
    }
    // initial MV build: one full scan of the PINNED v1 snapshot
    val base = spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s
        |FROM graft_stage.work.orders_mv VERSION AS OF 1
        |GROUP BY o_orderstatus""".stripMargin)
    // refresh: aggregate ONLY the delta files, merge into the standing MV
    val delta = graft.sources.catalog.StagingMaintenance
      .changesBetween(spark, "graft_stage", "work", "orders_mv", 1L, 3L)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_d"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("s_d"))
      .withColumnRenamed("status", "status_d")
    base.join(delta, col("status") === col("status_d"), "full_outer")
      .select(
        coalesce(col("status"), col("status_d")).as("status"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0).cast("decimal(28,4)")) +
          coalesce(col("s_d"), lit(0).cast("decimal(28,4)"))).cast("double").as("total"))
      .orderBy(col("status"))
  }

  val q256Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (2, 5, 9)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q257

  /** CLUSTER BY as a maintenance rewrite — what makes zone maps effective on
    * data that arrived UNCLUSTERED: the table builds in three commits each
    * sliced by `o_orderkey % 3`, so every file spans the whole keyspace and
    * q253's footer stats can skip nothing. `optimize(clusterBy =
    * o_orderkey)` range-partitions + sorts the rewrite, the per-file
    * [min,max] become disjoint, and the same narrow range predicate now
    * touches ~1 of 8 files (CatalogSpec asserts all-files before vs
    * few-files after). This is the lakehouse OPTIMIZE-with-clustering
    * pattern — at 100 TB, re-clustering cold data by the dominant filter
    * key is how an append-only object-store table keeps its scans
    * proportional to the query, not the corpus. The oracle recomputes over
    * `orders` directly: layout changed, content didn't.
    */
  def q257ClusteredLayout(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cl_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_cl")
    spark.sql( // ingestion-order commits: every file spans the full keyspace
      """CREATE TABLE graft_stage.work.orders_cl AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cl_src WHERE o_orderkey % 3 = 0""".stripMargin)
    Seq(1, 2).foreach { s =>
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_cl
           |SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders_cl_src WHERE o_orderkey % 3 = $s""".stripMargin)
    }
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_cl", targetFiles = 8,
      clusterBy = Some("o_orderkey"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_cl", Seq("o_orderkey"))
    val (scan, _, _) = graft.sources.catalog.StagingMaintenance.prunedScan(
      spark, "graft_stage", "work", "orders_cl", "o_orderkey", 100L, 600L)
    scan.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("status"))
  }

  val q257Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey BETWEEN 100 AND 600
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q261

  /** SQL row-level DELETE on the staging catalog — the last DML face of the
    * lakehouse surface (after CTAS/INSERT/ALTER/OPTIMIZE/VACUUM/time
    * travel/CDC): `DELETE FROM graft_stage.work.t WHERE <pred>` reaches the
    * table's `SupportsDelete.deleteWhere` and executes as a copy-on-write
    * rewrite — the current file set is rewritten without the matching rows
    * and committed as a NEW kind=delete version, while the pre-delete
    * version stays pinnable (`VERSION AS OF`) until VACUUM. This is how an
    * object-store corpus actually honors a takedown/PII purge: immutable
    * files, deletion by replacement, history retained until retention
    * policy says otherwise. The query deletes a key range and aggregates
    * the survivors; the oracle recomputes from `orders` with the inverse
    * predicate — a hash match proves the rewrite removed exactly the
    * requested rows. CatalogSpec proves the version mechanics (pre-delete
    * snapshot intact, unsupported predicates refused, change feed refuses
    * to cross the rewrite).
    */
  def q261SqlDelete(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_del_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_del")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_del AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_del_src WHERE o_orderkey % 7 = 0""".stripMargin)
    spark.sql(
      "DELETE FROM graft_stage.work.orders_del " +
        "WHERE o_orderkey >= 100 AND o_orderkey <= 700")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_del
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q261Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderkey % 7 = 0 AND NOT (o_orderkey BETWEEN 100 AND 700)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q263

  /** Footer-answered aggregates: with parquet aggregate pushdown enabled,
    * `count(*) / min / max` over a staging-catalog table compile to a scan
    * that reads ONLY file footers — `PushedAggregation` in the plan, no row
    * data touched (PlanSpec asserts it). This is the purest expression of
    * the reference's metadata-operation surface (`getFileStatus`/`listStatus`
    * answering without reading objects, CephRgwFileSystem.java:374-439):
    * the parquet footer plays the role of the object-store stat, and a
    * 100 TB `count(*)` costs one metadata read per file instead of a
    * table scan. The conf is save/restored (the try/finally hermeticity
    * rule); the oracle recomputes from `orders` — proving footer-served
    * answers equal row-scan answers.
    */
  def q263FooterAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_fa_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_fa")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_fa AS
        |SELECT o_orderkey, o_custkey FROM orders_fa_src
        |WHERE o_orderkey % 5 = 0""".stripMargin)
    val prev = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      // collect NOW so the footer-only plan executes under the conf
      val rows = spark.sql(
        """SELECT count(*) AS n, min(o_orderkey) AS min_key,
          |  max(o_orderkey) AS max_key, max(o_custkey) AS max_cust
          |FROM graft_stage.work.orders_fa""".stripMargin).collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("min_key", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("max_key", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("max_cust", org.apache.spark.sql.types.LongType))))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None    => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
    }
  }

  val q263Oracle: String =
    """SELECT count(*) AS n, min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key, max(o_custkey) AS max_cust
      |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin

  // ---------------------------------------------------------------- q271

  /** SQL UPDATE on the staging catalog, via Spark's group-based row-level
    * operation framework (SupportsRowLevelOperations → ReplaceData): the
    * rewrite reads the table through the operation's scan (pushdown
    * deliberately stripped — a pruned read would drop unaffected rows from
    * the whole-table replacement), applies the SET to matching rows, and
    * commits the replacement as a kind=update version — non-matching rows
    * survive byte-for-byte, pre-update snapshots stay pinnable, and the
    * change feed refuses to cross the rewrite. This is the
    * repair/backfill face a governed corpus needs (fix a mislabeled
    * field in place) that INSERT-only tables can't express. The oracle
    * recomputes the post-update state from `orders` with a CASE — the
    * hash match proves the rewrite updated exactly the matching rows.
    */
  def q271SqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_upd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_upd")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_upd AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_upd_src WHERE o_orderkey % 9 = 0""".stripMargin)
    spark.sql( // repair pass: zero out price on one status slice
      "UPDATE graft_stage.work.orders_upd SET o_totalprice = 0.0D " +
        "WHERE o_orderstatus = 'F'")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_upd
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q271Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n, min(o_orderkey) AS min_key,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_orderstatus = 'F' THEN 0.0 ELSE o_totalprice END")} AS total
       |FROM orders WHERE o_orderkey % 9 = 0
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q272

  /** SQL MERGE INTO on the staging catalog — the upsert face of the same
    * group-based rewrite (q104 is the DataFrame-level MERGE; this is the
    * full SQL statement against a versioned catalog table): a source slice
    * updates matched keys and inserts unmatched ones in ONE atomic
    * copy-on-write commit (kind=merge). The oracle recomputes the merged
    * state from `orders` set algebra — matched keys take the source's
    * value, unmatched targets keep theirs, source-only keys append.
    */
  def q272MergeInto(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_mrg_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_mrg")
    spark.sql( // target: slices 0 and 5 of mod 10
      """CREATE TABLE graft_stage.work.orders_mrg AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_mrg_src WHERE o_orderkey % 10 IN (0, 5)""".stripMargin)
    spark.sql( // source: slices 5 and 7 — 5 matches (update), 7 inserts
      """MERGE INTO graft_stage.work.orders_mrg t
        |USING (SELECT o_orderkey, o_orderstatus, o_totalprice
        |       FROM orders_mrg_src WHERE o_orderkey % 10 IN (5, 7)) s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1000.0D
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
        |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_mrg
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q272Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice + 1000.0 ELSE o_totalprice END")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (0, 5, 7)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q296

  /** `MERGE … WHEN NOT MATCHED BY SOURCE` — the FULL-SYNC face (Spark 4
    * SQL): one statement makes the target mirror the source exactly —
    * matched rows update, source-only rows insert, and TARGET-ONLY rows
    * (absent from the feed — the rows a plain upsert would silently
    * strand) DELETE. This is the nightly-snapshot reconciliation pattern:
    * the feed is authoritative, the catalog table converges to it while
    * every pre-sync version stays pinnable (the same group-based
    * copy-on-write commit as q272, optimistic against the scanned base).
    * The oracle is simply the source slice post-transform — full sync
    * means the target IS the source.
    */
  def q296MergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_fs_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_sync")
    spark.sql( // stale target: slices 0 and 5 (5 will update, 0 must DELETE)
      """CREATE TABLE graft_stage.work.orders_sync AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_fs_src WHERE o_orderkey % 10 IN (0, 5)""".stripMargin)
    spark.sql( // authoritative feed: slices 5 and 7
      """MERGE INTO graft_stage.work.orders_sync t
        |USING (SELECT o_orderkey, o_orderstatus, o_totalprice
        |       FROM orders_fs_src WHERE o_orderkey % 10 IN (5, 7)) s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 500.0D
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
        |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_sync
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q296Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice + 500.0 ELSE o_totalprice END")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (5, 7)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q301

  /** FILE-GRANULAR SQL UPDATE — the write-path answer to "a one-row UPDATE
    * on a 100 TB table must not rewrite 100 TB": orders staged and CLUSTER
    * BY o_orderkey, zone maps analyzed, then a keyed
    * `UPDATE … WHERE o_orderkey BETWEEN …` goes through the group-based
    * row-level framework whose scan PRUNES groups (files) the condition
    * provably cannot touch and whose commit carries every unscanned file
    * into the new version BY NAME (StagingRowLevelOperation; CatalogSpec
    * proves ≥6 of 8 files untouched). Only the keyed slice of objects is
    * read and rewritten — the reference's per-object write surface
    * (`CephRgwFileSystem.java:216-289`) at catalog scale. The in-query
    * `require` guards the carry actually happened; the oracle hash proves
    * the rewrite changed exactly the matching rows.
    */
  def q301FileGranularUpdate(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_fgu_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_fgu")
    // clustered layout in ONE read+write (range-partitioned CTAS; the r8
    // lifecycle-cost lesson — no second whole-table OPTIMIZE pass)
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_fgu AS
        |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_fgu_src WHERE o_orderkey % 3 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_fgu", Seq("o_orderkey"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_fgu").toSet
    // scale-relative slice: the low 1/8th of the keyspace, so the carry
    // property holds at every SF (a fixed literal can swallow the whole
    // keyspace at small scale) — the oracle recomputes the same bound
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_fgu")
      .collect()(0).getLong(0) / 8L
    spark.sql(
      s"""UPDATE graft_stage.work.orders_fgu SET o_totalprice = 0.0D
         |WHERE o_orderkey <= $hi""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_fgu").toSet
    require(after.intersect(before).nonEmpty,
      s"keyed UPDATE carried no files: whole-table rewrite regression " +
        s"(before=${before.size}, after=${after.size})")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_fgu
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q301Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_orderkey <= (SELECT max(o_orderkey) FROM orders " +
              "WHERE o_orderkey % 3 = 0) // 8 THEN 0.0 ELSE o_totalprice END")} AS total
       |FROM orders WHERE o_orderkey % 3 = 0
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q302

  /** FILE-GRANULAR SQL MERGE via RUNTIME GROUP FILTERING — the MERGE
    * condition references the source, so no static pushdown can reach the
    * target scan; instead Spark evaluates the group-filter EXISTS over the
    * source, collects the matched join keys, and delivers them to the
    * row-level scan as a runtime IN (RowLevelGroupScan's
    * SupportsRuntimeV2Filtering), which zone maps turn into a file set. A
    * keyed CDC-style upsert into a clustered table then reads and rewrites
    * only the files holding matched keys; inserts land in fresh files;
    * everything else carries by name (CatalogSpec proves ≥6 of 8
    * untouched). This is the FAISS-free half of the lakehouse story: a
    * 100 TB target absorbs a small delta at delta-cost, not table-cost.
    */
  def q302FileGranularMerge(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_fgm_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_fgm")
    spark.sql( // target: slices 0 and 5 of mod 10, whole keyspace —
      // range-clustered at CTAS time (one read+write, no OPTIMIZE pass)
      """CREATE TABLE graft_stage.work.orders_fgm AS
        |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_fgm_src WHERE o_orderkey % 10 IN (0, 5)""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_fgm", Seq("o_orderkey"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_fgm").toSet
    // scale-relative delta band: the low 1/8th of the target keyspace (a
    // fixed literal can swallow the whole keyspace at small SF) — the
    // oracle recomputes the same bound
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_fgm")
      .collect()(0).getLong(0) / 8L
    spark.sql( // keyed delta: low band only — 5 updates, 7 inserts
      s"""MERGE INTO graft_stage.work.orders_fgm t
         |USING (SELECT o_orderkey, o_orderstatus, o_totalprice
         |       FROM orders_fgm_src
         |       WHERE o_orderkey <= $hi
         |         AND o_orderkey % 10 IN (5, 7)) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1000.0D
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_fgm").toSet
    require(after.intersect(before).nonEmpty,
      s"keyed MERGE carried no files: runtime group filtering regression " +
        s"(before=${before.size}, after=${after.size})")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_fgm
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q302Oracle: String = {
    val hiSql = "(SELECT max(o_orderkey) FROM orders WHERE o_orderkey % 10 IN (0, 5)) // 8"
    s"""SELECT o_orderstatus AS status, count(*) AS n, min(o_orderkey) AS min_key,
       |  ${graft.operators.Det.dsumSql(
            s"CASE WHEN o_orderkey <= $hiSql AND o_orderkey % 10 = 5 " +
              "THEN o_totalprice + 1000.0 ELSE o_totalprice END")} AS total
       |FROM orders
       |WHERE o_orderkey % 10 IN (0, 5)
       |   OR (o_orderkey <= $hiSql AND o_orderkey % 10 = 7)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin
  }

  // ---------------------------------------------------------------- q304

  /** PARTITIONED staging table lifecycle — the ingest-layout contract at
    * 100 TB: CREATE … PARTITIONED BY (event_type) declares the identity
    * partitioning, ingest lands flat (small-commit object-store reality),
    * `OPTIMIZE partitionBy` beds the current set into `event_type=v/`
    * directories (the reference's readdir namespace,
    * `CephRgwFileSystem.java:374-386`) while keeping the column IN the
    * files — so zone maps see each laid-out file as a CONSTANT and a
    * partition DELETE (`WHERE event_type = 'view'`) erases whole
    * partitions METADATA-ONLY (mustMatchAll drop — no data file read or
    * rewritten; CatalogSpec asserts rewritten == 0). The oracle recomputes
    * the surviving aggregate straight from `events` — hash match proves
    * the layout + drop changed placement and manifests, never content.
    */
  def q304PartitionedTable(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_pt_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_pt")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_pt
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)
        |  PARTITIONED BY (event_type)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_pt
        |SELECT event_id, user_id, event_type, value FROM events_pt_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "events_pt", partitionBy = Some("event_type"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "events_pt", Seq("event_type"))
    graft.sources.catalog.ZoneMapScan.lastDeleteSplit = None
    spark.sql("DELETE FROM graft_stage.work.events_pt WHERE event_type = 'view'")
    val split = graft.sources.catalog.ZoneMapScan.lastDeleteSplit
    require(split.exists { case (_, drop, rew) => drop >= 1 && rew == 0 },
      s"partition DELETE was not metadata-only: $split")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_pt
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q304Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events WHERE event_type <> 'view'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q305

  /** ROW-LEVEL change feed across a FILE-GRANULAR rewrite — the CDC face
    * the append-only file diff (q251) refuses: after a keyed UPDATE, the
    * two versions share every carried file by name, so
    * `rowLevelChanges` diffs ONLY the touched files (EXCEPT ALL bag
    * semantics cancel rewritten-but-unchanged rows) and emits the exact
    * delete/insert pairs of the updated slice. The in-query require pins
    * the scale property: the diff read a strict subset of the table's
    * files. Oracle = the slice's before/after rows recomputed from
    * `orders` — hash match proves the net delta is exactly the update.
    */
  def q305RowLevelDiff(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_rld_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_rld")
    // range-clustered at CTAS time (v1) — one read+write, no OPTIMIZE pass
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_rld AS
        |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_rld_src WHERE o_orderkey % 4 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_rld", Seq("o_orderkey"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rld").toSet
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_rld")
      .collect()(0).getLong(0) / 8L
    spark.sql(
      s"""UPDATE graft_stage.work.orders_rld SET o_totalprice = o_totalprice + 5.0D
         |WHERE o_orderkey <= $hi""".stripMargin)
    val diff = graft.sources.catalog.StagingMaintenance.rowLevelChanges(
      spark, "graft_stage", "work", "orders_rld", 1L, 2L)
    // scale property: the keyed rewrite carried most files, so the diff's
    // input (removed ∪ added) is a strict subset of the table's file set
    val shared = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rld")
      .toSet.intersect(before)
    require(shared.nonEmpty,
      "row-level diff lost file granularity: no CTAS-era file was carried")
    diff.groupBy(col("_change"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("_change"), col("status"))
  }

  val q305Oracle: String = {
    val hiSql = "(SELECT max(o_orderkey) FROM orders WHERE o_orderkey % 4 = 0) // 8"
    s"""WITH slice AS (
       |  SELECT o_orderstatus, o_totalprice FROM orders
       |  WHERE o_orderkey % 4 = 0 AND o_orderkey <= $hiSql),
       |delta AS (
       |  SELECT 'delete' AS _change, o_orderstatus, o_totalprice FROM slice
       |  UNION ALL
       |  SELECT 'insert' AS _change, o_orderstatus, o_totalprice + 5.0 FROM slice)
       |SELECT _change, o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM delta GROUP BY _change, o_orderstatus
       |ORDER BY _change, status""".stripMargin
  }

  // ---------------------------------------------------------------- q306

  /** IS NULL / IS NOT NULL zone-map pruning through plain SQL — the
    * null-count sidecar face: a sparse enrichment column (`vip_price`,
    * NULL below the price threshold) is
    * clustered by price, so low files are ALL-null and high files
    * null-free; ANALYZE records per-file (nulls, rows) and the DSv2 scan
    * prunes `IS NOT NULL` to the value-bearing files and `IS NULL` to the
    * null-bearing ones (in-query requires assert files were skipped).
    * This is the "scan only the enriched subset" pattern sparse feature
    * columns need at 100 TB. Oracle recomputes both aggregates from the
    * same CASE.
    */
  def q306NullPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_np_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_np")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_np AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CASE WHEN o_totalprice >= 150000.0 THEN o_totalprice
        |       ELSE CAST(NULL AS DOUBLE) END AS vip_price
        |FROM orders_np_src WHERE o_orderkey % 5 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_np", targetFiles = 8,
      clusterBy = Some("o_totalprice"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_np", Seq("o_totalprice", "vip_price"))
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val vip = spark.sql(
      """SELECT count(*) AS n_vip,
        |  CAST(sum(CAST(vip_price AS DECIMAL(18,4))) AS DOUBLE) AS vip_total
        |FROM graft_stage.work.orders_np WHERE vip_price IS NOT NULL""".stripMargin)
      .collect()(0)
    val notNullPrune = graft.sources.catalog.ZoneMapScan.lastPrune
    require(notNullPrune.exists { case (k, t) => k < t },
      s"IS NOT NULL pruned nothing: $notNullPrune")
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val plain = spark.sql(
      "SELECT count(*) AS n_null FROM graft_stage.work.orders_np WHERE vip_price IS NULL")
      .collect()(0)
    require(graft.sources.catalog.ZoneMapScan.lastPrune.exists { case (k, t) => k < t },
      s"IS NULL pruned nothing: ${graft.sources.catalog.ZoneMapScan.lastPrune}")
    import spark.implicits._
    Seq((vip.getLong(0), vip.getDouble(1), plain.getLong(0)))
      .toDF("n_vip", "vip_total", "n_null")
  }

  val q306Oracle: String =
    s"""SELECT
       |  CAST(count(CASE WHEN o_totalprice >= 150000.0 THEN 1 END) AS BIGINT) AS n_vip,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_totalprice >= 150000.0 THEN o_totalprice ELSE 0.0 END")} AS vip_total,
       |  CAST(count(CASE WHEN o_totalprice < 150000.0 THEN 1 END) AS BIGINT) AS n_null
       |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin

  // ---------------------------------------------------------------- q273

  /** DESCRIBE-HISTORY face of the versioned catalog
    * ([[graft.sources.catalog.StagingMaintenance.history]]): a table is
    * driven through the full DML/maintenance lifecycle — CTAS, INSERT,
    * DELETE, UPDATE, OPTIMIZE, INSERT — and the history reads back one
    * kind-tagged row per version, the audit trail an operator uses to
    * understand what happened to a table (and what the change feed may
    * cross). File counts and timestamps are layout/wall-clock noise and
    * stay out of the query face; the oracle is the op sequence itself as
    * literal rows — deterministic because version numbering and kinds are
    * functions of the statement sequence alone.
    */
  def q273TableHistory(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_hist_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_hist")
    spark.sql( // v1: commit
      """CREATE TABLE graft_stage.work.orders_hist AS
        |SELECT o_orderkey, o_orderstatus FROM orders_hist_src
        |WHERE o_orderkey % 50 = 0""".stripMargin)
    spark.sql( // v2: commit
      """INSERT INTO graft_stage.work.orders_hist
        |SELECT o_orderkey, o_orderstatus FROM orders_hist_src
        |WHERE o_orderkey % 50 = 1""".stripMargin)
    spark.sql( // v3: delete (metadata path)
      "DELETE FROM graft_stage.work.orders_hist WHERE o_orderkey < 100")
    spark.sql( // v4: update (row-level rewrite)
      "UPDATE graft_stage.work.orders_hist SET o_orderstatus = 'X' " +
        "WHERE o_orderstatus = 'P'")
    graft.sources.catalog.StagingMaintenance.optimize( // v5: optimize
      spark, "graft_stage", "work", "orders_hist", targetFiles = 2)
    spark.sql( // v6: commit
      """INSERT INTO graft_stage.work.orders_hist
        |SELECT o_orderkey, o_orderstatus FROM orders_hist_src
        |WHERE o_orderkey % 50 = 2""".stripMargin)
    graft.sources.catalog.StagingMaintenance
      .history(spark, "graft_stage", "work", "orders_hist")
      .select(col("version"), col("kind"))
      .orderBy(col("version"))
  }

  val q273Oracle: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 'commit'), (2, 'commit'), (3, 'delete'),
      |  (4, 'update'), (5, 'optimize'), (6, 'commit'))
      |  AS t(version, kind)
      |ORDER BY version""".stripMargin

  // ---------------------------------------------------------------- q277

  /** Conjunctive zone-map scan: the table is CLUSTER-BY-rewritten on
    * o_orderkey (so key ranges are disjoint per file) and the query
    * predicates BOTH o_orderkey and o_custkey — the key range prunes files
    * by stats, the second range rides along as a row filter plus a
    * stats check that can only prune further (AND composition,
    * [[graft.sources.catalog.StagingMaintenance.prunedScan]]). CatalogSpec
    * proves the file-count mechanics including the provably-empty
    * conjunction; this face proves the pruned read is ANSWER-preserving
    * under a multi-predicate workload.
    */
  def q277ConjunctiveScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cj_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_cj")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_cj AS
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders_cj_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_cj", targetFiles = 8,
      clusterBy = Some("o_orderkey"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_cj", Seq("o_orderkey", "o_custkey"))
    val (scan, _, _) = graft.sources.catalog.StagingMaintenance.prunedScan(
      spark, "graft_stage", "work", "orders_cj",
      Seq(("o_orderkey", 200L, 900L), ("o_custkey", 0L, 400L)))
    scan.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"), max(col("o_custkey")).as("max_cust"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("status"))
  }

  val q277Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_custkey) AS max_cust,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderkey BETWEEN 200 AND 900 AND o_custkey BETWEEN 0 AND 400
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q307

  /** Bloom-sidecar point lookup ([[graft.sources.catalog.StagingMaintenance
    * .analyzeBloom]]): a hash-distributed CTAS leaves every file's
    * [min,max] spanning the whole keyspace — zone maps provably keep 8/8
    * files for an equality probe (first in-query require). `CALL bloom`
    * builds per-file Bloom filters over xxhash64 of the key; the same probe
    * then opens only the file(s) that can hold it (second require: ≤2 of
    * 8). This is THE missing pruning face for point lookups on
    * hash-ingested 100 TB tables, where clustering by every lookup key is
    * impossible. The probe key is the table's max orderkey — computed as a
    * bounded 1-row driver read (q160/q263 precedent), scale-relative so the
    * query is meaningful at every SF. Oracle recomputes the same rows with
    * a scalar subquery.
    */
  def q307BloomLookup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("li_bloom_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.li_bloom")
    spark.sql(
      """CREATE TABLE graft_stage.work.li_bloom AS
        |SELECT /*+ REPARTITION(8, l_orderkey) */ l_orderkey, l_linenumber, l_quantity
        |FROM li_bloom_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "li_bloom", Seq("l_orderkey"))
    // probe a MID-RANGE key (scale-relative, bounded 1-row driver reads):
    // an extreme key would be range-prunable by accident — only the file
    // holding the global max reaches it — which is not the case this query
    // exists to prove
    val key = spark.sql(
      """SELECT max(l_orderkey) FROM graft_stage.work.li_bloom
        |WHERE l_orderkey <= (SELECT max(l_orderkey) DIV 2
        |                     FROM graft_stage.work.li_bloom)""".stripMargin)
      .collect()(0).getLong(0)
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    spark.sql(s"SELECT count(*) FROM graft_stage.work.li_bloom WHERE l_orderkey = $key")
      .collect()
    val zOnly = graft.sources.catalog.ZoneMapScan.lastPrune
    require(zOnly.exists { case (k, t) => t == 8 && k >= 7 },
      s"hash layout should defeat range pruning: $zOnly")
    graft.sources.catalog.StagingMaintenance.analyzeBloom(
      spark, "graft_stage", "work", "li_bloom", Seq("l_orderkey"),
      expectedItems = 100000L, fpp = 0.0001)
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val out = spark.sql(
      s"""SELECT l_orderkey, l_linenumber, l_quantity
         |FROM graft_stage.work.li_bloom WHERE l_orderkey = $key
         |ORDER BY l_linenumber""".stripMargin)
    val rows = out.collect()
    val bPrune = graft.sources.catalog.ZoneMapScan.lastPrune
    require(bPrune.exists { case (k, t) => t == 8 && k <= 2 },
      s"bloom should confine the probe: $bPrune")
    import spark.implicits._
    rows.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      .toDF("l_orderkey", "l_linenumber", "l_quantity")
  }

  val q307Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem
      |                    WHERE l_orderkey <= (SELECT max(l_orderkey) // 2 FROM lineitem))
      |ORDER BY l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q308

  /** RESTORE ([[graft.sources.catalog.StagingMaintenance.restore]]): the
    * operational "undo" — a destructive DELETE is rolled back by `CALL
    * restore`, which commits a NEW version referencing the old version's
    * exact file set. METADATA-ONLY: the in-query require proves the
    * restored table serves the ORIGINAL files by name (copy-on-write kept
    * them on disk), so rollback cost is one manifest write whether the
    * table is 1 GB or 100 TB. The rollback is itself versioned
    * (kind=restore in history; the deleted state stays pinnable), which is
    * what distinguishes RESTORE from overwrite. Oracle recomputes the
    * pre-delete aggregate straight from `orders` — a hash match proves the
    * round trip is lossless.
    */
  def q308RestoreRollback(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_rst_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_rst")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_rst AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_rst_src WHERE o_orderkey % 7 = 0""".stripMargin) // v1
    val v1Files = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rst").toSet
    spark.sql("DELETE FROM graft_stage.work.orders_rst WHERE o_orderkey % 2 = 0") // v2
    graft.sources.catalog.StagingMaintenance.restore(
      spark, "graft_stage", "work", "orders_rst", toVersion = 1L) // v3
    val nowFiles = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rst").toSet
    require(nowFiles == v1Files,
      s"restore must serve v1's files by name: ${nowFiles.size} vs ${v1Files.size}")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_rst
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q308Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 7 = 0
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q309

  /** CHECK constraints ([[graft.sources.catalog.CheckConstraint]]): the
    * table declares `check = 'qty >= 0'`; a conforming INSERT lands, a
    * violating INSERT fails INSIDE the write tasks (codegen'd predicate,
    * zero extra passes) and — the part that matters — commits NOTHING: no
    * partial rows, no version manifest (both in-query requires). Write-time
    * validation is the only enforcement point an immutable object store
    * offers (the reference writes objects whole,
    * `CephRgwFileSystem.java:216-289`). The oracle recomputes the surviving
    * aggregate from `lineitem`: a hash match proves the failed statement
    * left the table bit-for-bit intact.
    */
  def q309CheckConstraint(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("li_chk_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.li_chk")
    spark.sql(
      """CREATE TABLE graft_stage.work.li_chk
        |(k BIGINT, flag STRING, qty DOUBLE)
        |TBLPROPERTIES ('check' = 'qty >= 0')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.li_chk
        |SELECT l_orderkey, l_returnflag, l_quantity FROM li_chk_src
        |WHERE l_orderkey % 3 = 0""".stripMargin)
    val versionsBefore = graft.sources.catalog.StagingMaintenance
      .history(spark, "graft_stage", "work", "li_chk").count()
    val failed =
      try {
        spark.sql(
          """INSERT INTO graft_stage.work.li_chk
            |SELECT l_orderkey, l_returnflag, -l_quantity FROM li_chk_src
            |WHERE l_orderkey % 3 = 1""".stripMargin)
        false
      } catch {
        case e: Throwable =>
          Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
            .exists(t => Option(t.getMessage).exists(_.contains("CHECK constraint violated")))
      }
    require(failed, "violating INSERT did not fail with a CHECK violation")
    val versionsAfter = graft.sources.catalog.StagingMaintenance
      .history(spark, "graft_stage", "work", "li_chk").count()
    require(versionsAfter == versionsBefore, "failed write minted a version")
    spark.sql(
      """SELECT flag, count(*) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM graft_stage.work.li_chk GROUP BY flag ORDER BY flag""".stripMargin)
  }

  val q309Oracle: String =
    s"""SELECT l_returnflag AS flag, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("l_quantity")} AS total_qty
       |FROM lineitem WHERE l_orderkey % 3 = 0
       |GROUP BY l_returnflag ORDER BY flag""".stripMargin

  // ---------------------------------------------------------------- q313

  /** Catalog-resolved V2 functions ([[graft.sources.catalog
    * .StagingFunctions]]): the bucketing scalar and the decimal-exact sum
    * aggregate live IN the catalog and resolve by three-part name —
    * `graft_stage.system.mod_bucket` / `.dsum4` — through Spark's DSv2
    * function resolution (no session-local registration anywhere). The
    * scalar carries the magic `invoke(long, int)` method, so the bucket
    * computation compiles into whole-stage codegen; the aggregate runs
    * Spark's distributed partial/merge plan with an exact BigDecimal state,
    * so its result is partitioning-independent by construction. Oracle
    * mirrors both with plain arithmetic: ((k%n)+n)%n and the Det decimal
    * sum — a hash match proves the catalog functions compute exactly their
    * declared semantics.
    */
  def q313CatalogFunctions(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_fn_src")
    spark.sql(
      """SELECT graft_stage.system.mod_bucket(o_custkey, 16) AS bucket,
        |  count(*) AS n, graft_stage.system.dsum4(o_totalprice) AS total
        |FROM orders_fn_src GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q313Oracle: String =
    s"""SELECT CAST(((o_custkey % 16) + 16) % 16 AS INT) AS bucket,
       |  count(*) AS n, ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q315

  /** `INSERT OVERWRITE … PARTITION` — atomic replace-partition, the daily
    * re-load/restatement contract of a partitioned 100 TB ingest layout.
    * SupportsOverwrite on the staging write path commits the statement's
    * delete phase and insert phase as ONE manifest: the target partition's
    * files (constant zone maps ⇒ provably all-matching) drop
    * METADATA-ONLY, untouched partitions carry BY NAME, and the fresh
    * files join in the same create-exclusive commit — no reader can
    * observe a truncated-but-not-reloaded table, and the pre-overwrite
    * version stays pinnable until VACUUM. In-query requires prove: exactly
    * one version minted, zero files read or rewritten by the delete phase,
    * and the untouched partition carried verbatim. Oracle recomputes the
    * restatement (F-partition prices doubled) straight from `orders`.
    */
  def q315InsertOverwrite(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_ow_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_ow")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_ow
        |(o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        |PARTITIONED BY (o_orderstatus)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_ow
        |SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders_ow_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_ow", targetFiles = 2,
      partitionBy = Some("o_orderstatus"))
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_ow", Seq("o_orderstatus"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_ow")
    val carried = before.filterNot(_.startsWith("o_orderstatus=F/")).toSet
    val versions = graft.sources.catalog.StagingMaintenance
      .history(spark, "graft_stage", "work", "orders_ow").count()
    // restatement: reload partition F with corrected (doubled) prices
    spark.sql(
      """INSERT OVERWRITE graft_stage.work.orders_ow PARTITION (o_orderstatus = 'F')
        |SELECT o_orderkey, o_totalprice * 2 FROM orders_ow_src
        |WHERE o_orderstatus = 'F'""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_ow")
    require(carried.subsetOf(after.toSet), "untouched partitions must carry by name")
    require(!after.exists(_.startsWith("o_orderstatus=F/")),
      "replaced partition's old files must drop")
    require(graft.sources.catalog.StagingMaintenance
      .history(spark, "graft_stage", "work", "orders_ow").count() == versions + 1,
      "overwrite must be ONE atomic commit")
    val split = graft.sources.catalog.ZoneMapScan.lastDeleteSplit
    require(split.exists { case (_, dropped, rewritten) => dropped > 0 && rewritten == 0 },
      s"partition drop must be metadata-only: $split")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_ow GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q315Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql(
            "CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2 ELSE o_totalprice END")} AS total
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q317

  /** DEFAULT column values (`TableCatalogCapability
    * .SUPPORT_COLUMN_DEFAULT_VALUE`): the catalog persists Spark's
    * CURRENT_DEFAULT/EXISTS_DEFAULT field metadata in its schema sidecar,
    * so (a) INSERTs that omit a defaulted column get it filled by the
    * analyzer, and (b) after `ADD COLUMN … DEFAULT d`, rows in files
    * written BEFORE the alter surface `d` at read time — schema evolution
    * with NO backfill rewrite, the lakehouse answer to "add a column to
    * 100 TB". The oracle recomputes both effects with literals.
    */
  def q317DefaultColumns(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("li_dft_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.li_dft")
    spark.sql(
      """CREATE TABLE graft_stage.work.li_dft
        |(k BIGINT, qty DOUBLE, grade STRING DEFAULT 'raw')""".stripMargin)
    // era 1: grade omitted everywhere → CURRENT_DEFAULT fills 'raw'
    spark.sql(
      """INSERT INTO graft_stage.work.li_dft (k, qty)
        |SELECT l_orderkey, l_quantity FROM li_dft_src WHERE l_orderkey % 4 = 0""".stripMargin)
    // era 2: a new column with a default — no rewrite, old files backfill
    spark.sql("ALTER TABLE graft_stage.work.li_dft ADD COLUMN batch INT DEFAULT 1")
    spark.sql(
      """INSERT INTO graft_stage.work.li_dft
        |SELECT l_orderkey, l_quantity, 'checked', 2 FROM li_dft_src
        |WHERE l_orderkey % 4 = 1""".stripMargin)
    spark.sql(
      """SELECT grade, batch, count(*) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM graft_stage.work.li_dft GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val q317Oracle: String =
    s"""SELECT CASE WHEN l_orderkey % 4 = 0 THEN 'raw' ELSE 'checked' END AS grade,
       |  CAST(CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE 2 END AS INT) AS batch,
       |  count(*) AS n, ${graft.operators.Det.dsumSql("l_quantity")} AS total_qty
       |FROM lineitem WHERE l_orderkey % 4 IN (0, 1)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q318

  /** MERGE-ON-READ via equality-delete DELETION VECTORS — the q302 CDC
    * workload replayed on the layout copy-on-write cannot fix: a
    * HASH-DISTRIBUTED target (every file spans the whole keyspace — the
    * q307 shape), where a keyed MERGE's matched keys touch EVERY file and
    * file-granular COW still rewrites the entire table per batch. The
    * table is created `'graft.write.mode'='merge-on-read'`, so Spark plans
    * `WriteDelta` through [[graft.sources.catalog.DeletionVectors]]: the
    * MERGE writes ONLY the new row versions as fresh files plus ONE DV
    * sidecar of replaced keys — the in-query require proves ZERO
    * pre-merge files were rewritten. The oracle is IDENTICAL to q302's
    * (same data, same delta): the hash match IS the MOR ≡ COW proof. At
    * 100 TB this bounds merge WRITE cost by O(changed rows); OPTIMIZE
    * later folds the DVs back to a clean columnar layout (CatalogSpec
    * covers fold, DV time travel, ghost-proof re-merge, and VACUUM
    * retention).
    *
    * The READ-side trade, stated honestly: Spark's
    * `RowLevelOperationRuntimeGroupFiltering` matches only group-based
    * `ReplaceData` plans (verified against the 4.1 bytecode), so a delta
    * MERGE's target scan gets no runtime IN — static pushdown (UPDATE /
    * DELETE conditions via zone maps, blooms, and partition paths) still
    * prunes, but an unbounded MERGE reads its full candidate set per
    * batch. That is exactly the lakehouse guidance the two per-table
    * modes encode: merge-on-read for write-heavy keyed churn, the q302
    * copy-on-write + runtime-group-filter path for read-heavy targets;
    * bounding the ON clause with a static key range restores file
    * skipping for MOR merges too — [[q323BoundedMorMerge]] is that move,
    * proven.
    */
  def q318MergeOnRead(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_mor_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_mor")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_mor
        |  (o_orderkey BIGINT NOT NULL, o_orderstatus STRING, o_totalprice DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read',
        |               'graft.merge-keys'='o_orderkey')""".stripMargin)
    // hash-distributed 8-file layout SHAPED AT INSERT (one write, no
    // OPTIMIZE pass): each file spans the whole keyspace, so the delta's
    // matched keys hit every file — the COW-worst-case this query exists on
    spark.sql(
      """INSERT INTO graft_stage.work.orders_mor
        |SELECT /*+ REPARTITION(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_mor_src WHERE o_orderkey % 10 IN (0, 5)""".stripMargin)
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_mor").toSet
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_mor")
      .collect()(0).getLong(0) / 8L
    spark.sql( // the q302 delta, verbatim
      s"""MERGE INTO graft_stage.work.orders_mor t
         |USING (SELECT o_orderkey, o_orderstatus, o_totalprice
         |       FROM orders_mor_src
         |       WHERE o_orderkey <= $hi
         |         AND o_orderkey % 10 IN (5, 7)) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1000.0D
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_mor").toSet
    require(before.subsetOf(after),
      s"merge-on-read rewrote ${(before -- after).size} files — DV regression")
    require(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "orders_mor").nonEmpty,
      "MOR merge committed no deletion vector")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_mor
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** Same computation as q302's oracle — by design: hash equality across
    * the two write paths is the MOR ≡ COW equivalence proof.
    */
  val q318Oracle: String = q302Oracle

  // ---------------------------------------------------------------- q319

  /** `days(ts)` PARTITION TRANSFORM — the single most common 100 TB ingest
    * layout (a time-partitioned events table), now first-class: CREATE
    * declares `PARTITIONED BY (days(ts))`, `OPTIMIZE partitionBy` beds the
    * current set into `ts_day=yyyy-MM-dd/` directories with the source
    * column kept IN the files (the q304 rule), and the PATH-BASED pruner
    * serves a one-day predicate reading only that day's files — proven
    * in-query via lastPrune with NO stats sidecar (ANALYZE never runs
    * here). A whole-day DELETE is METADATA-ONLY (partMustMatchAll from the
    * directory value alone; rewritten == 0 proven in-query). Day
    * boundaries are UTC (the engine pins session TZ to UTC).
    */
  def q319DaysPartition(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_day_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_day")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_day
        |  (event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)
        |  PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_day
        |SELECT event_id, ts, event_type, value FROM events_day_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "events_day", partitionBy = Some("days(ts)"))
    // deliberately NO ANALYZE: every skip below comes from the path alone.
    // The probe day derives from the SOURCE view — same value, one fewer
    // full catalog-table scan in the action chain (r9 lifecycle-trim rule)
    val minDay = spark.sql(
      "SELECT date_format(min(ts), 'yyyy-MM-dd') FROM events_day_src")
      .collect()(0).getString(0)
    val nextDay = java.time.LocalDate.parse(minDay).plusDays(1).toString
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val dayRows = spark.sql(
      s"""SELECT count(*) FROM graft_stage.work.events_day
         |WHERE ts >= TIMESTAMP '$minDay 00:00:00' AND ts < TIMESTAMP '$nextDay 00:00:00'"""
        .stripMargin).collect()(0).getLong(0)
    val prune = graft.sources.catalog.ZoneMapScan.lastPrune
    require(dayRows > 0 && prune.exists { case (k, t) => t > 1 && k * 2 <= t },
      s"one-day predicate did not path-prune: rows=$dayRows prune=$prune")
    graft.sources.catalog.ZoneMapScan.lastDeleteSplit = None
    spark.sql(
      s"""DELETE FROM graft_stage.work.events_day
         |WHERE ts >= TIMESTAMP '$minDay 00:00:00' AND ts < TIMESTAMP '$nextDay 00:00:00'"""
        .stripMargin)
    val split = graft.sources.catalog.ZoneMapScan.lastDeleteSplit
    require(split.exists { case (_, drop, rew) => drop >= 1 && rew == 0 },
      s"whole-day DELETE was not metadata-only: $split")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_day
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q319Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE CAST(ts AS DATE) <> (SELECT min(CAST(ts AS DATE)) FROM events)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q320

  /** `bucket(n, k)` PARTITION TRANSFORM — hash-bucket layout for
    * point-lookup-heavy keys. Zone maps are STRUCTURALLY useless here
    * (every bucket's [min,max] spans the whole keyspace), so the file skip
    * comes from the path: a `user_id = v` probe computes its canonical
    * `mod_bucket` residue ([[graft.sources.catalog.StagingFunctions]]'s
    * one bucketing — SQL, writer, and pruner agree) and opens only that
    * bucket's directory — 1/n of the table with NO stats sidecar, proven
    * in-query via lastPrune. At 100 TB this is the Iceberg bucket-
    * transform story: key-scatter becomes key-locality without sorting.
    */
  def q320BucketPartition(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_bkt_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_bkt")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_bkt
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)
        |  PARTITIONED BY (bucket(8, user_id))""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_bkt
        |SELECT event_id, user_id, event_type, value FROM events_bkt_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "events_bkt", partitionBy = Some("bucket(8,user_id)"))
    // deliberately NO ANALYZE — min/max could never separate buckets anyway
    val uid = spark.sql("SELECT max(user_id) FROM graft_stage.work.events_bkt")
      .collect()(0).getLong(0) / 2L
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val out = spark.sql(
      s"""SELECT count(*) AS n, min(event_id) AS min_ev, max(event_id) AS max_ev,
         |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
         |FROM graft_stage.work.events_bkt WHERE user_id = $uid""".stripMargin)
    val n = out.collect()(0).getLong(0)
    val prune = graft.sources.catalog.ZoneMapScan.lastPrune
    require(n > 0 && prune.exists { case (k, t) => t >= 8 && k * 4 <= t },
      s"bucket point lookup did not path-prune to ~1/8: rows=$n prune=$prune")
    out
  }

  val q320Oracle: String =
    s"""SELECT count(*) AS n, min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE user_id = (SELECT max(user_id) FROM events) // 2""".stripMargin

  // ---------------------------------------------------------------- q321

  /** TYPE-WIDENING schema evolution — `ALTER COLUMN k TYPE BIGINT` /
    * `x TYPE DOUBLE` as a PURE SIDECAR EDIT (the most common non-rename
    * ALTER on long-lived tables): pre-widen files keep their int32/float
    * pages and Spark 4's vectorized reader promotes them at scan time
    * (SPARK-40876), so a 100 TB table widens in O(1). The in-query require
    * proves the widen rewrote nothing; era snapshots keep pre-widen
    * versions readable under the narrow schema (CatalogSpec pins that).
    * Post-widen rows exceed the old INT range — the mixed-file scan's hash
    * match against the oracle is the read-time-promotion proof.
    */
  def q321TypeWidening(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("li_wide_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.li_wide")
    spark.sql("CREATE TABLE graft_stage.work.li_wide (k INT, qty FLOAT)")
    spark.sql(
      """INSERT INTO graft_stage.work.li_wide
        |SELECT CAST(l_orderkey AS INT), CAST(l_quantity AS FLOAT)
        |FROM li_wide_src WHERE l_orderkey % 3 = 0""".stripMargin)
    val filesBefore = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "li_wide").toSet
    spark.sql("ALTER TABLE graft_stage.work.li_wide ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE graft_stage.work.li_wide ALTER COLUMN qty TYPE DOUBLE")
    require(graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "li_wide").toSet == filesBefore,
      "type widening must be sidecar-only (zero file rewrites)")
    spark.sql( // era 2: values beyond the old INT range
      """INSERT INTO graft_stage.work.li_wide
        |SELECT l_orderkey + 5000000000, l_quantity
        |FROM li_wide_src WHERE l_orderkey % 3 = 1""".stripMargin)
    spark.sql(
      """SELECT CASE WHEN k >= 5000000000 THEN 'wide' ELSE 'narrow' END AS era,
        |  count(*) AS n, max(k) AS max_k,
        |  CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM graft_stage.work.li_wide GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q321Oracle: String =
    s"""SELECT CASE WHEN l_orderkey % 3 = 1 THEN 'wide' ELSE 'narrow' END AS era,
       |  count(*) AS n,
       |  max(CASE WHEN l_orderkey % 3 = 1 THEN l_orderkey + 5000000000
       |           ELSE l_orderkey END) AS max_k,
       |  ${graft.operators.Det.dsumSql(
            "CAST(CASE WHEN l_orderkey % 3 = 0 THEN CAST(l_quantity AS REAL) " +
              "ELSE l_quantity END AS DOUBLE)")} AS total_qty
       |FROM lineitem WHERE l_orderkey % 3 IN (0, 1)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q322

  /** MULTI-COLUMN `CLUSTER BY` VIA Z-ORDER — `CALL optimize(…,
    * cluster_by => 'l_partkey,l_suppkey')` lays the table on the Morton
    * curve (the q243 audit made a MAINTENANCE operation), so per-file
    * [min,max] stays bounded on BOTH dimensions and the ordinary zone maps
    * prune predicates on EITHER column — the q277 two-predicate shape
    * WITHOUT choosing one pruning dimension at layout time. Both probes'
    * file skips are proven in-query via lastPrune; the final aggregate's
    * hash match proves the curve changed placement, never content.
    */
  def q322ZorderCluster(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("li_z_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.li_z")
    spark.sql(
      """CREATE TABLE graft_stage.work.li_z AS
        |SELECT l_partkey, l_suppkey, l_quantity FROM li_z_src""".stripMargin)
    spark.sql("CALL graft_stage.optimize('work', 'li_z', 8, 'l_partkey,l_suppkey', NULL)")
    spark.sql("CALL graft_stage.analyze('work', 'li_z', 'l_partkey,l_suppkey')")
    // probe bounds from the SOURCE view (identical maxima by construction;
    // one fewer catalog-table scan in the action chain)
    val b = spark.sql(
      "SELECT max(l_partkey), max(l_suppkey) FROM li_z_src").collect()(0)
    val (p0, s0) = (3L * b.getLong(0) / 4L, b.getLong(1) / 2L + 1L)
    import graft.sources.catalog.ZoneMapScan
    // probe 1: partkey-only band must skip files
    ZoneMapScan.lastPrune = None
    val n1 = spark.sql(
      s"SELECT count(*) FROM graft_stage.work.li_z WHERE l_partkey >= $p0")
      .collect()(0).getLong(0)
    val prune1 = ZoneMapScan.lastPrune
    require(n1 > 0 && prune1.exists { case (k, t) => t >= 8 && k < t },
      s"z-order did not prune on l_partkey: $prune1")
    // probe 2: suppkey-only band must skip files TOO — the z-order payoff
    ZoneMapScan.lastPrune = None
    val n2 = spark.sql(
      s"SELECT count(*) FROM graft_stage.work.li_z WHERE l_suppkey >= $s0")
      .collect()(0).getLong(0)
    val prune2 = ZoneMapScan.lastPrune
    require(n2 > 0 && prune2.exists { case (k, t) => t >= 8 && k < t },
      s"z-order did not prune on l_suppkey: $prune2")
    spark.sql(
      s"""SELECT count(*) AS n, min(l_partkey) AS min_p, max(l_suppkey) AS max_s,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
         |FROM graft_stage.work.li_z
         |WHERE l_partkey >= $p0 AND l_suppkey >= $s0""".stripMargin)
  }

  val q322Oracle: String = {
    val p0 = "(SELECT 3 * max(l_partkey) // 4 FROM lineitem)"
    val s0 = "(SELECT max(l_suppkey) // 2 + 1 FROM lineitem)"
    s"""SELECT count(*) AS n, min(l_partkey) AS min_p, max(l_suppkey) AS max_s,
       |  ${graft.operators.Det.dsumSql("l_quantity")} AS total_qty
       |FROM lineitem
       |WHERE l_partkey >= $p0 AND l_suppkey >= $s0""".stripMargin
  }

  // ---------------------------------------------------------------- q323

  /** BOUNDED MERGE-ON-READ MERGE — ENGINE-ENFORCED (r10; r9 shipped the
    * hand-written form): Spark 4.1's
    * `RowLevelOperationRuntimeGroupFiltering` matches only group-based
    * `ReplaceData` plans, so a delta (MOR) MERGE's target scan gets NO
    * runtime IN of matched keys and an unbounded MOR merge reads the
    * whole target. The [[graft.sources.catalog.BoundedMorMerge]] optimizer
    * rule (registered by GraftExtensions) now closes the gap INSIDE the
    * engine: it derives the source-key envelope `[lo, hi]` with one tiny
    * aggregate during optimization and injects
    * `Filter(t.k BETWEEN lo AND hi)` above the merge join's target side —
    * the user writes a PLAIN `ON t.k = s.k` merge (this query does; the
    * prune require below proves the injection reached the zone maps).
    *
    * The r9 hazard is now structural, not documentation: the rule fires
    * only when the join does NOT preserve unmatched target rows, so a
    * `WHEN NOT MATCHED BY SOURCE` merge (target-preserving outer join)
    * is never bounded — CatalogSpec's polarity test pins it.
    *
    * Plan mechanics: ordinary predicate pushdown moves the injected
    * target-only range conjunct into the row-level scan builder, and the
    * zone maps turn it into a file set. On a range-clustered target the
    * merge then READS only the delta's key band (lastPrune proves files
    * skipped) and the committed deletion vector is SCOPED to those files
    * alone — read cost and DV blast radius both O(delta band), not
    * O(table).
    */
  def q323BoundedMorMerge(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_bmm_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_bmm")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_bmm
        |  (o_orderkey BIGINT NOT NULL, o_orderstatus STRING, o_totalprice DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read',
        |               'graft.merge-keys'='o_orderkey')""".stripMargin)
    // RANGE-clustered at insert (the q302 layout): zone maps can translate
    // a key band into a file subset — the layout bounded merges exist for
    spark.sql(
      """INSERT INTO graft_stage.work.orders_bmm
        |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_bmm_src WHERE o_orderkey % 10 IN (0, 5)""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_bmm", Seq("o_orderkey"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_bmm").toSet
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_bmm")
      .collect()(0).getLong(0) / 8L
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    spark.sql( // the q302 delta with a PLAIN ON clause — no hand-written
               // envelope; the BoundedMorMerge rule injects it
      s"""MERGE INTO graft_stage.work.orders_bmm t
         |USING (SELECT o_orderkey, o_orderstatus, o_totalprice
         |       FROM orders_bmm_src
         |       WHERE o_orderkey <= $hi
         |         AND o_orderkey % 10 IN (5, 7)) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1000.0D
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (s.o_orderkey, s.o_orderstatus, s.o_totalprice)""".stripMargin)
    // proof 1: the ENGINE-injected envelope reached the row-level scan and
    // zone maps skipped out-of-band files — the merge read a file subset
    require(graft.sources.catalog.ZoneMapScan.lastPrune.exists { case (k, t) => k < t },
      s"bounded MOR merge pruned nothing: ${graft.sources.catalog.ZoneMapScan.lastPrune}")
    // proof 2: merge-on-read — zero pre-merge files rewritten
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_bmm").toSet
    require(before.subsetOf(after),
      s"bounded MOR merge rewrote ${(before -- after).size} files — DV regression")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_bmm
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** Same recompute as q302/q318 — by design: the hash match proves the
    * envelope conjunct changed WHICH FILES were read, not the answer.
    */
  val q323Oracle: String = q302Oracle

  // ---------------------------------------------------------------- q326

  /** DECLARED APPEND SORT ORDER — ingest-time clustering via DSv2
    * `RequiresDistributionAndOrdering`: a table created with
    * `'graft.sort-order'='o_orderkey'` makes EVERY append's Write request
    * an ordered distribution, so Spark range-partitions and sorts the
    * incoming rows before one writer runs — appended files carry disjoint
    * [min,max] on the sort key from the FIRST plain `INSERT INTO`, no
    * REPARTITION_BY_RANGE hint in user SQL, no OPTIMIZE pass afterwards.
    * This is the ingest half of the clustering story (OPTIMIZE clusterBy
    * is the maintenance half): at 100 TB a keyed table stays
    * zone-map-prunable continuously instead of degrading between
    * compactions. The query proves it end-to-end: CREATE with the
    * property, hint-free INSERT, ANALYZE (stats harvest only — layout is
    * already sorted), then a key-band aggregate whose in-query require
    * pins that files were SKIPPED. The planner-enforced sort also means
    * every writer task receives its rows in sort order — parquet pages
    * inside each file are key-ordered too, so row-group stats (the
    * sub-file skipping layer Spark's reader already does) stay tight for
    * free.
    */
  def q326SortedAppend(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_soa_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_soa")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_soa
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        |TBLPROPERTIES ('graft.sort-order'='o_orderkey',
        |               'graft.target-file-size'='2048')""".stripMargin)
    // Test-scale plumbing only: AQE's coalesce floor (minPartitionSize,
    // default 1 MiB) is production-tuned — at this SF the whole insert is
    // ~100 KiB, so without lowering the floor AQE would (correctly, for
    // production) merge every range partition into one file and leave
    // nothing to prune. At a real 512 MiB target-file-size the floor is
    // irrelevant. Saved and restored around the INSERT.
    val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val savedMin = spark.conf.getOption(minKey)
    spark.conf.set(minKey, "1k")
    try {
      spark.sql( // NO layout hint: the table's declared order does the work
        """INSERT INTO graft_stage.work.orders_soa
          |SELECT o_orderkey, o_orderstatus, o_totalprice
          |FROM orders_soa_src WHERE o_orderkey % 3 = 0""".stripMargin)
      ()
    } finally savedMin match {
      case Some(v) => spark.conf.set(minKey, v)
      case None    => spark.conf.unset(minKey)
    }
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "orders_soa", Seq("o_orderkey"))
    val hi = spark.sql("SELECT max(o_orderkey) FROM graft_stage.work.orders_soa")
      .collect()(0).getLong(0) / 8L
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val out = spark.sql(
      s"""SELECT count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
         |FROM graft_stage.work.orders_soa
         |WHERE o_orderkey <= $hi""".stripMargin)
    val n = out.collect()(0) // force the scan so lastPrune reflects it
    require(graft.sources.catalog.ZoneMapScan.lastPrune.exists { case (k, t) => k < t },
      "sorted append produced no prunable layout: " +
        s"${graft.sources.catalog.ZoneMapScan.lastPrune} — " +
        "RequiresDistributionAndOrdering regression")
    import spark.implicits._
    Seq((n.getLong(0), n.getLong(1), n.getLong(2), n.getDouble(3)))
      .toDF("n", "min_key", "max_key", "total")
  }

  val q326Oracle: String = {
    val hiSql = "(SELECT max(o_orderkey) FROM orders WHERE o_orderkey % 3 = 0) // 8"
    s"""SELECT count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderkey % 3 = 0 AND o_orderkey <= $hiSql""".stripMargin
  }

  // ---------------------------------------------------------------- q327

  /** PERSISTED BM25 INDEX — the text-retrieval face of the persisted-ANN
    * story (q246 IVF / q303 PQ): posting lists live as CATALOG TABLES and
    * queries are served from the index with NO raw-documents scan.
    *
    *   - `bm25_postings (tok, doc_id, tf)` is created with
    *     `'graft.sort-order'='tok'` — every ingest INSERT lands files
    *     range-disjoint on the TOKEN (the q326 machinery doing real
    *     work), so a query's term probe `tok IN (…)` zone-map-prunes to
    *     the few files holding those tokens. At 100 TB this is the
    *     inverted-index seek: open the posting files for the query terms,
    *     not the corpus.
    *   - `bm25_doclen (doc_id, dl)` carries lengths; the 1-row corpus
    *     stats (N, Σdl) aggregate from it at query time (metadata-scale).
    *   - INCREMENTAL: the corpus arrives in TWO ingest slices, each one
    *     plain INSERT into both tables — no rebuild, df/avgdl stay exact
    *     because they are derived at query time from the (pruned) index
    *     itself, never cached stale.
    *
    * The serve step computes the SAME BM25 as q242 (k1=1.2, b=0.75,
    * decimal-summed term scores) — and the oracle IS q242's whole-corpus
    * recompute from raw text: the hash match proves index-served ≡
    * corpus-recomputed. In-query requires pin the scale shape: the probe
    * pruned posting files, and the serve plan never touches the documents
    * parquet.
    */
  /** Build-once guard for the persisted BM25 index — the same
    * shared-artifact discipline as [[ensureIvfIndex]]/[[ensurePqIndex]]: a
    * posting index is built by INGESTION and probed by every query
    * thereafter, so the build must not be priced into the serve path. The
    * r9 shape (rebuild per invocation at a 4 KiB target file size) was
    * superlinear in its own output: each INSERT sprayed hundreds of tiny
    * files through the range-exchange write, per-file footer ANALYZE paid
    * once per file, and every rebuild first paid DROP's recursive delete
    * over the previous spray (52 s second iteration at sf0.1). Fixed
    * lifecycle: 64 KiB targets — the pruning proof needs MULTI-file, not
    * hundred-file (≈6 files at sf0.01, ≈30 at sf0.1) — and the index is
    * built exactly once per (root, corpus); every q327 invocation serves.
    */
  private val bm25IndexReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureBm25Index(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    bm25IndexReady.computeIfAbsent(s"$stageRoot|$dir", _ => {
      graft.sources.Tables.documents(spark, dir).createOrReplaceTempView("docs_bm25_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.bm25_postings")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.bm25_doclen")
      spark.sql(
        """CREATE TABLE graft_stage.work.bm25_postings
          |  (tok STRING, doc_id BIGINT, tf BIGINT)
          |TBLPROPERTIES ('graft.sort-order'='tok',
          |               'graft.target-file-size'='65536')""".stripMargin)
      spark.sql("CREATE TABLE graft_stage.work.bm25_doclen (doc_id BIGINT, dl BIGINT)")
      // COMMIT GROUP (r11): postings and doclen publish as ONE vector — a
      // writer killed between the two INSERTs of a slice leaves readers on
      // the previous consistent pair (postings with no doc lengths is
      // unservable garbage); the in-process build-once map above is a cost
      // guard, no longer a correctness assumption
      spark.sql(
        "CALL graft_stage.group_create('work', 'bm25', 'bm25_postings,bm25_doclen')")
      // test-scale plumbing (the q326 note): lower AQE's production coalesce
      // floor (1 MiB) under the 64 KiB advisory so the test-scale postings
      // actually land multi-file
      val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
      val savedMin = spark.conf.getOption(minKey)
      spark.conf.set(minKey, "16k")
      try {
        // the corpus arrives in two ingest slices — each is ONE insert per
        // table, the index is never rebuilt
        for (slice <- 0 to 1) {
          spark.sql(
            s"""INSERT INTO graft_stage.work.bm25_postings
               |SELECT tok, doc_id, count(*) AS tf
               |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok
               |      FROM docs_bm25_src WHERE doc_id % 2 = $slice)
               |GROUP BY tok, doc_id""".stripMargin)
          spark.sql(
            s"""INSERT INTO graft_stage.work.bm25_doclen
               |SELECT doc_id, count(*) AS dl
               |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok
               |      FROM docs_bm25_src WHERE doc_id % 2 = $slice)
               |GROUP BY doc_id""".stripMargin)
          // phase 2: both member INSERTs of this slice become readable at
          // this single pointer flip, or (on a crash above) not at all
          spark.sql("CALL graft_stage.group_publish('work', 'bm25')")
        }
      } finally savedMin match {
        case Some(v) => spark.conf.set(minKey, v)
        case None    => spark.conf.unset(minKey)
      }
      graft.sources.catalog.StagingMaintenance.analyze(
        spark, "graft_stage", "work", "bm25_postings", Seq("tok"))
      "built"
    })
  }

  /** One-call builder for every persisted serving index (IVF cells, PQ
    * codes+codebook, BM25 postings) — the bench's warm-up hook. Builds are
    * ingestion-side, one-time costs; the bench's min-of-two-iterations
    * methodology already excludes them from reported timings (the q69
    * rule), so paying them untimed up front changes no reported number —
    * it only keeps the DISPERSION guard a real signal (iter1-with-build vs
    * iter2-serve-only is a lifecycle artifact, not a robustness bug).
    */
  def prewarmServingIndexes(spark: SparkSession, dir: String): Unit = {
    ensurePqIndex(spark, dir) // ensures the IVF index first
    ensureBm25Index(spark, dir)
  }

  def q327Bm25Index(spark: SparkSession, dir: String): DataFrame = {
    ensureBm25Index(spark, dir)
    // ---- serve: q242's query, from the INDEX alone -----------------------
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    val served = spark.sql(
      """WITH tf AS (
        |  SELECT tok, doc_id, tf FROM graft_stage.work.bm25_postings
        |  WHERE tok IN ('vector', 'stream', 'scan')),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        |           FROM graft_stage.work.bm25_doclen),
        |ts AS (
        |  SELECT t.doc_id, t.tf,
        |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)) *
        |    ((CAST(t.tf AS DOUBLE) * 2.2D) / (CAST(t.tf AS DOUBLE) + 1.2D *
        |      (0.25D + 0.75D * CAST(dl AS DOUBLE)
        |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS term_score
        |  FROM tf t JOIN dfreq USING (tok)
        |    JOIN graft_stage.work.bm25_doclen USING (doc_id), corpus)
        |SELECT doc_id, count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS sum_tf,
        |  CAST(sum(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        |FROM ts GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin)
    served.collect() // force the scan so lastPrune reflects THIS probe
    // proof 1: the term probe pruned posting files (the inverted-index seek)
    require(graft.sources.catalog.ZoneMapScan.lastPrune.exists { case (k, t) => k < t },
      s"term probe pruned nothing: ${graft.sources.catalog.ZoneMapScan.lastPrune}")
    // proof 2: the serve plan reads ONLY index tables — no raw corpus scan
    val plan = served.queryExecution.executedPlan.toString
    require(!plan.contains("documents"),
      "BM25 serve plan scans the raw documents table — index regression")
    served
  }

  /** q242's whole-corpus recompute from raw text — by design: the hash
    * match is the index-served ≡ corpus-recomputed proof.
    */
  val q327Oracle: String = graft.operators.TextAnalysis.q242Oracle

  // ---------------------------------------------------------------- q328

  /** VERSION TAGS — named, VACUUM-proof snapshots (Iceberg-tag semantics
    * over the one-file-per-version log): `CALL tag(ns, tbl, 'baseline')`
    * pins the current version BY NAME, `VERSION AS OF 'baseline'` resolves
    * it in plain SQL, and VACUUM exempts the tagged version's manifest,
    * data files, and deletion vectors from retention until `drop_tag`.
    * This is the reproducible-training anchor: a run tags the corpus
    * version it trained on, ingestion and maintenance keep churning, and
    * months later the exact training corpus is still one SQL clause away —
    * while everything UNTAGGED ages out normally (the in-query requires
    * prove both: the intermediate version's manifest is GONE after
    * `vacuum(retain_last => 1)`, and the tagged read still hash-matches
    * its as-of content). Tag resolution costs one sidecar read; retention
    * is pure manifest arithmetic — nothing here scales with data volume.
    */
  def q328VersionTags(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_tag_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_tag")
    spark.sql( // v1: the "training corpus" snapshot
      """CREATE TABLE graft_stage.work.orders_tag AS
        |SELECT /*+ REPARTITION_BY_RANGE(4, o_orderkey) */
        |  o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tag_src WHERE o_orderkey % 6 = 0""".stripMargin)
    spark.sql("CALL graft_stage.tag('work', 'orders_tag', 'baseline')")
    // the table keeps evolving: a keyed UPDATE (v2) and fresh ingest (v3)
    // scale-relative update band from the SOURCE view (one fewer catalog
    // scan; the updated rows never reach the result — it reads the tag)
    val hi = spark.sql(
      "SELECT max(o_orderkey) FROM orders_tag_src WHERE o_orderkey % 6 = 0")
      .collect()(0).getLong(0) / 4L
    spark.sql(
      s"""UPDATE graft_stage.work.orders_tag SET o_totalprice = o_totalprice * 2.0D
         |WHERE o_orderkey <= $hi""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_tag
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tag_src WHERE o_orderkey % 6 = 3""".stripMargin)
    // retention: keep ONLY the head — except what tags pin
    spark.sql("CALL graft_stage.vacuum('work', 'orders_tag', 1)")
    val versions = spark.sql("CALL graft_stage.history('work', 'orders_tag')")
      .collect().map(_.getLong(0)).toSet
    require(versions.contains(1L) && versions.contains(3L) && !versions.contains(2L),
      s"tag retention broke: expected {1 (tagged), 3 (head)} only, got $versions")
    require(spark.sql("CALL graft_stage.tags('work', 'orders_tag')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("baseline", 1L)),
      "tags listing diverged")
    // the tagged read survives the vacuum byte-for-byte (oracle recomputes
    // the PRE-update slice from the raw table — a hash match proves it)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_tag VERSION AS OF 'baseline'
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  val q328Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 6 = 0
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q329

  /** TAG-TO-TAG CHANGE FEED — the corpus-release workflow the tag + change
    * feed machinery compose into: ingestion tags releases (`r1`, `r2`, …)
    * as it goes, and "what documents did release r2 add over r1?" is the
    * commit-range change feed between the two PINNED versions — by name,
    * long after untagged intermediate history aged out, and immune to the
    * table's CURRENT state (a third slice lands after r2 and must NOT
    * appear). Metadata cost: two sidecar reads resolve the names; the feed
    * scans only the files versions (r1, r2] appended — release-delta
    * cost, not table cost, at any scale.
    */
  def q329TagChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_tcf_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_tcf")
    spark.sql( // release 1
      """CREATE TABLE graft_stage.work.orders_tcf AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tcf_src WHERE o_orderkey % 9 = 0""".stripMargin)
    spark.sql("CALL graft_stage.tag('work', 'orders_tcf', 'r1')")
    spark.sql( // release 2 adds a disjoint slice
      """INSERT INTO graft_stage.work.orders_tcf
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tcf_src WHERE o_orderkey % 9 = 4""".stripMargin)
    spark.sql("CALL graft_stage.tag('work', 'orders_tcf', 'r2')")
    spark.sql( // post-release churn that must NOT leak into the r1->r2 feed
      """INSERT INTO graft_stage.work.orders_tcf
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_tcf_src WHERE o_orderkey % 9 = 7""".stripMargin)
    val tags = graft.sources.catalog.StagingMaintenance
      .tags(spark, "graft_stage", "work", "orders_tcf")
    val delta = graft.sources.catalog.StagingMaintenance.changesBetween(
      spark, "graft_stage", "work", "orders_tcf", tags("r1"), tags("r2"))
    delta.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("status"))
  }

  /** The r2-only slice recomputed from the raw table — the hash match
    * proves the tag-range feed is exactly the release delta, with neither
    * the r1 base nor the post-release churn leaking in.
    */
  val q329Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n, min(o_orderkey) AS min_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 9 = 4
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q330

  /** WRITE-AUDIT-PUBLISH via WRITABLE BRANCHES — the production curation
    * workflow every lakehouse ingest pipeline runs, on this catalog's
    * branch machinery (`CALL branch` → append to `cat.ns.t.branch_<name>`
    * → audit the branch face → `CALL publish` fast-forwards main):
    *
    *   - ingest lands TWO slices on branch 'audit' while main's readers
    *     keep seeing exactly the pre-branch corpus (the in-query requires
    *     pin main's row count AND head version across the branch writes —
    *     the WAP isolation guarantee),
    *   - the AUDIT step runs expectations against the branch face (row
    *     count, key nullability, key uniqueness — the q265 shape); only a
    *     passing audit publishes, a failing one would `drop_branch` and
    *     main would never have seen a row,
    *   - `CALL publish` fast-forwards main by COPYING the branch manifests
    *     into the main log under the manifest monitor (zero data bytes
    *     move — branch data files already live in the table dir), legal
    *     only while main still stands at the fork (CatalogSpec proves the
    *     conflict case: a main commit after the fork fails the publish).
    *
    * The oracle recomputes the published union straight from `orders` — a
    * hash match proves branch-ingest → audit → publish is lossless and
    * adds nothing.
    */
  def q330WriteAuditPublish(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_wap_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_wap")
    spark.sql( // the standing corpus main's readers see throughout
      """CREATE TABLE graft_stage.work.orders_wap AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_wap_src WHERE o_orderkey % 10 = 0""".stripMargin)
    val mainRows = spark.sql("SELECT count(*) FROM graft_stage.work.orders_wap")
      .collect()(0).getLong(0)
    spark.sql("CALL graft_stage.branch('work', 'orders_wap', 'audit')")
    for (slice <- Seq(3, 6)) // candidate ingest: two appends, branch-only
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_wap.branch_audit
           |SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders_wap_src WHERE o_orderkey % 10 = $slice""".stripMargin)
    // WAP isolation: main saw NOTHING — same rows, same head version
    require(spark.sql("SELECT count(*) FROM graft_stage.work.orders_wap")
      .collect()(0).getLong(0) == mainRows,
      "branch ingest leaked rows into main before publish")
    val (headV, _, _, _, _, _, _) = graft.sources.catalog.StagingMaintenance
      .detail(spark, "graft_stage", "work", "orders_wap")
    require(headV == 1L, s"branch ingest advanced main's head to $headV")
    // AUDIT the branch face (the expectations gate — q265's shape)
    val audit = spark.sql(
      """SELECT count(*) AS n, count_if(o_orderkey IS NULL) AS null_keys,
        |  count(*) - count(DISTINCT o_orderkey) AS dup_keys
        |FROM graft_stage.work.orders_wap.branch_audit""".stripMargin).collect()(0)
    require(audit.getLong(0) > mainRows && audit.getLong(1) == 0L && audit.getLong(2) == 0L,
      s"audit failed: $audit — would drop_branch, main never sees the batch")
    spark.sql("CALL graft_stage.publish('work', 'orders_wap', 'audit')")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_wap
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** Published union recomputed from raw orders — hash match proves the
    * branch round-trip (fork → append×2 → publish) is lossless.
    */
  val q330Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 10 IN (0, 3, 6)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q331

  /** POSITION-DELETE DELETION VECTORS — merge-on-read for KEYLESS tables
    * (raw event ingest with no natural row identifier, where equality
    * deletes have no key to speak and copy-on-write pays full rewrites):
    * `'graft.write.mode'='merge-on-read'` with NO `graft.merge-keys`
    * selects POSITION mode — a row-level DELETE locates matching rows as
    * `(file, _metadata.row_index)` (zone maps still pick the candidate
    * files first), records ONE (file → ordinals) sidecar, and commits the
    * SAME file set — the Iceberg position-delete shape, write cost
    * O(matched rows), zero data-file writes. Reads keep FULL parquet
    * predicate pushdown (r11): the scan requests Spark's generated
    * row-index column, so every row carries its true file ordinal —
    * row-group skipping included — and the readers drop deleted
    * (file, ordinal) rows and project the column off.
    *
    * The query stages events into a range-clustered keyless MOR table,
    * deletes an event-id band (zone maps bound the candidate files) and
    * then an event-type slice ON TOP (overlap proves already-suppressed
    * rows never re-match), requires ZERO files changed across both
    * deletes, and aggregates the survivors. Oracle recomputes from raw
    * events with both predicates — the hash match is the POS ≡ COW proof
    * (q261's delete semantics at zero rewrites).
    */
  def q331PositionDeletes(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_pd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_pd")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_pd
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_pd
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_pd_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "events_pd", Seq("event_id"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_pd").toSet
    val hi = spark.sql("SELECT max(event_id) FROM events_pd_src")
      .collect()(0).getLong(0) / 4L
    spark.sql(s"DELETE FROM graft_stage.work.events_pd WHERE event_id <= $hi")
    // overlapping second delete: suppressed rows must not re-match
    spark.sql("DELETE FROM graft_stage.work.events_pd WHERE event_type = 'click'")
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_pd").toSet
    require(before == after,
      s"position deletes changed the file set: ${(before diff after).size} gone, " +
        s"${(after diff before).size} new — COW regression")
    require(graft.sources.catalog.StagingMaintenance
        .activeDvs(spark, "graft_stage", "work", "events_pd").nonEmpty,
      "no position-DV sidecars active after two deletes")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_pd
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // ---------------------------------------------------------------- q350

  /** DISTRIBUTED position-delete sidecars (r13 — the 10M–500M matched-
    * ordinal middle band the r12 bound left to a full COW rewrite): a
    * keyless-MOR DELETE whose match exceeds the driver-map cap now writes
    * per-file RUN-ENCODED sidecar files from the EXECUTORS
    * ([[graft.sources.catalog.DeletionVectors.writePosRunDv]] — matched
    * rows repartition by file, sort by ordinal, and stream (start, len)
    * runs; one immutable bin per (task, file)); the driver handles ONLY
    * the (file → sidecar names) descriptor, O(covered files), and the
    * commit carries the same data-file set — blast radius stays zero data
    * writes at ANY match size under the distributed ceiling. Reads keep
    * full parquet pushdown: the run files parse in the executor that
    * reads the covered file (sorted-run binary search per ordinal), and
    * maintenance reads suppress via a non-broadcast anti-join over the
    * runs parsed in parallel — no path ever materializes the ordinals on
    * the driver. At 100 TB: a 200M-row retention DELETE on an unclustered
    * table costs one pass over the candidate files + run-sidecar bytes,
    * not a table rewrite, and not 3 GB of driver heap.
    *
    * The query drops the driver cap to force the distributed path at
    * every SF, deletes a quarter-corpus band and an event-type slice on
    * top (overlap: suppressed rows never re-match), requires BOTH commits
    * took the distributed sidecar mode with ZERO file changes, and
    * aggregates survivors. Oracle recomputes from raw events — the hash
    * match is the distributed-DV ≡ COW proof.
    */
  def q350DistributedPosDeletes(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_pdd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_pdd")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_pdd
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_pdd
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_pdd_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "events_pdd", Seq("event_id"))
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_pdd").toSet
    val hi = spark.sql("SELECT max(event_id) FROM events_pdd_src")
      .collect()(0).getLong(0)
    val lo3 = hi - hi / 4L // top-quarter band
    val capKey = "spark.graft.pos-delete.max-matched-rows"
    val savedCap = spark.conf.getOption(capKey)
    spark.conf.set(capKey, "64") // both deletes exceed this at every SF
    try {
      def mode(): Option[String] =
        graft.sources.catalog.ZoneMapScan.lastPosDeleteMode
      spark.sql(s"DELETE FROM graft_stage.work.events_pdd WHERE event_id > $lo3")
      require(mode().contains("dv-distributed"),
        s"over-cap delete did not take the distributed sidecar path: ${mode()}")
      // overlapping second delete: suppressed rows must not re-match, and
      // the visible match is still over the cap at every SF
      spark.sql("DELETE FROM graft_stage.work.events_pdd WHERE event_type = 'view'")
      require(mode().contains("dv-distributed"),
        s"second over-cap delete fell off the distributed path: ${mode()}")
      val after = graft.sources.catalog.StagingMaintenance
        .currentFileNames(spark, "graft_stage", "work", "events_pdd").toSet
      require(before == after,
        s"distributed position deletes changed the file set: " +
          s"${(before diff after).size} gone, ${(after diff before).size} new")
      val dvs = graft.sources.catalog.StagingMaintenance
        .activeDvs(spark, "graft_stage", "work", "events_pdd")
      require(dvs.size == 2 && dvs.forall(_.startsWith("dvr-")),
        s"expected two distributed run descriptors, got $dvs")
    } finally savedCap match {
      case Some(v) => spark.conf.set(capKey, v)
      case None    => spark.conf.unset(capKey)
    }
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_pdd
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // ---------------------------------------------------------------- q351

  /** KEYLESS MERGE-ON-READ UPDATE/MERGE via POSITION DELTAS (r13 — the
    * write-amplification gap the keyed MOR path left open for keyless
    * tables): with no merge key to speak, the row id is the
    * `(_graft_file, _graft_pos)` metadata pair (the Iceberg `_file`/`_pos`
    * shape), so UPDATE and MERGE plan `WriteDelta` — replaced rows become
    * run-encoded position sidecars written BY THE EXECUTORS
    * ([[graft.sources.catalog.StagingPosDeltaWriterFactory]]; the driver
    * sees only file→bin names), replacement rows become ordinary new
    * files, and NOTHING is rewritten. At 100 TB: patching 0.1% of a
    * keyless event corpus costs sidecar bytes + 0.1% new rows instead of
    * rewriting every touched file. The same pair reads back in plain SQL
    * as row provenance.
    *
    * The query drives UPDATE (modulo predicate — untranslatable, so it
    * must take the delta path, proven by the zero-rewrite require) →
    * overlapping UPDATE (ghosts never re-match) → MERGE (matched updates
    * delta, unmatched insert) and aggregates the final corpus; requires
    * pin every pre-existing file carried BY NAME across all three
    * statements plus the run descriptors in the active DV set. Oracle
    * recomputes the patched corpus from raw events.
    */
  def q351KeylessPosDelta(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_kpd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_kpd")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_kpd
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_kpd
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_kpd_src""".stripMargin)
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_kpd").toSet
    // modulo predicate: the metadata-delete face cannot translate it, so
    // this MUST ride the position-delta operation — zero rewrites
    spark.sql(
      "UPDATE graft_stage.work.events_kpd SET value = value + 100 WHERE event_id % 5 = 2")
    // overlap: the same band again — replacement rows match, ghosts don't
    spark.sql(
      "UPDATE graft_stage.work.events_kpd SET value = value + 10 " +
        "WHERE event_id % 5 = 2 AND event_type = 'click'")
    // MERGE on the keyless table: the %97=3 slice re-typed via the delta
    spark.sql(
      """MERGE INTO graft_stage.work.events_kpd t
        |USING (SELECT event_id FROM events_kpd_src WHERE event_id % 97 = 3) s
        |ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET event_type = 'patched'""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_kpd").toSet
    require(before.subsetOf(after),
      s"keyless position deltas rewrote ${(before -- after).size} files — COW regression")
    require(after.size > before.size,
      "delta statements landed no replacement files")
    val dvs = graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "events_kpd")
    require(dvs.size == 3 && dvs.forall(_.startsWith("dvr-")),
      s"expected three run descriptors (one per delta statement), got $dvs")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_kpd
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // ---------------------------------------------------------------- q352

  /** ZERO-COPY SHALLOW CLONE (r14 — [[graft.sources.catalog.TableClone]]):
    * `CALL clone(ns, src, dst)` commits a new table whose first version
    * REFERENCES the source snapshot's files in place — no data bytes move
    * (required below: zero parquet files in the clone dir at creation).
    * Divergence is ordinary commits into the clone's OWN directory, and
    * vacuum is safe in BOTH directions: the clone registers on its source,
    * so a source-side `VACUUM` exempts still-borrowed files even after
    * they leave the source's head (required below — the source is
    * overwritten and hard-vacuumed mid-query, and the clone still reads
    * every borrowed byte); clone-side vacuum discovers dead files by
    * LISTING its own dir, so borrowed files are structurally out of reach.
    * At 100 TB: a dev/backfill copy of the corpus costs one manifest
    * write and O(metadata), not hours of data copy and double storage —
    * and retention jobs on the source cannot brick it.
    *
    * The query clones a two-slice orders table, diverges BOTH sides
    * (insert into the clone, overwrite the source), vacuums the source
    * to one retained version, and aggregates the CLONE — whose content
    * is now three slices none of which the source's head still serves.
    * Oracle recomputes those slices from raw orders.
    */
  def q352ShallowClone(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cl_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cl_dst") // child first:
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cl_src") // src drop refuses under live clones
    spark.sql(
      """CREATE TABLE graft_stage.work.cl_src AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cl_src WHERE o_orderkey % 7 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.cl_src
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cl_src WHERE o_orderkey % 7 = 3""".stripMargin)
    val fs = new org.apache.hadoop.fs.Path(stageRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetIn(t: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$stageRoot/work/$t"))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSet
    val borrowed = parquetIn("cl_src")
    spark.sql("CALL graft_stage.clone('work', 'cl_src', 'cl_dst')")
    require(parquetIn("cl_dst").isEmpty,
      "shallow clone copied data files — not zero-copy")
    // diverge the clone; then rewrite + hard-vacuum the source so its head
    // no longer references one borrowed byte
    spark.sql(
      """INSERT INTO graft_stage.work.cl_dst
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cl_src WHERE o_orderkey % 7 = 5""".stripMargin)
    spark.sql(
      """INSERT OVERWRITE graft_stage.work.cl_src
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cl_src WHERE o_orderkey % 7 = 1""".stripMargin)
    spark.sql("CALL graft_stage.vacuum('work', 'cl_src', 1)")
    require(borrowed.forall(f => fs.exists(
      new org.apache.hadoop.fs.Path(s"$stageRoot/work/cl_src/$f"))),
      "source vacuum reclaimed files the live clone still borrows")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.cl_dst
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  // ---------------------------------------------------------------- q360

  /** CLONE OF A MERGE-ON-READ SNAPSHOT (r14 — closes the boundary q352
    * declared: clone refused MOR tables and DV-carrying snapshots). The
    * snapshot's descriptors TRANSPLANT into the clone's own sidecar dir
    * ([[graft.sources.catalog.DeletionVectors.transplantDvs]]): run bins
    * and key bins copy (sidecar bytes — never data bytes), covered-file
    * references rename to the bare names the borrowed-entry read path
    * keys by. The clone then owns its delete machinery outright: the
    * source can fold, rewrite, even hard-vacuum — nothing it reclaims is
    * referenced by the clone's suppression state, and borrowed DATA files
    * stay exempt through the standard clone registration. At 100 TB: a
    * dev snapshot of a live CDC-merged corpus costs descriptor bytes,
    * not a fold-then-copy of the table.
    *
    * The query builds a keyless MOR corpus with BOTH descriptor kinds in
    * force (a pos-delta UPDATE's run descriptor + a selective DELETE's
    * inline sidecar), clones it (requires: zero parquet copied,
    * transplanted descriptors active, suppression exact through the
    * clone), then overwrites AND hard-vacuums the source and aggregates
    * the clone — whose content no source version still serves. Oracle
    * recomputes the patched surviving corpus from raw events.
    */
  def q360MorClone(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_mc_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_mcc")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_mcs")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_mcs
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_mcs
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_mc_src""".stripMargin)
    spark.sql(
      "UPDATE graft_stage.work.events_mcs SET value = value + 100 WHERE event_id % 10 = 7")
    spark.sql("DELETE FROM graft_stage.work.events_mcs WHERE event_id % 25 = 4")
    require(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "events_mcs").size == 2,
      "expected the run + inline descriptors in force at clone time")
    spark.sql("CALL graft_stage.clone('work', 'events_mcs', 'events_mcc')")
    val fs = new org.apache.hadoop.fs.Path(stageRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$stageRoot/work/events_mcc"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "MOR clone copied data files — must stay zero-copy")
    require(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "events_mcc").size == 2,
      "clone carries no transplanted descriptors")
    val cntSrc = spark.sql("SELECT count(*) FROM graft_stage.work.events_mcs")
      .collect()(0).getLong(0)
    val cntClone = spark.sql("SELECT count(*) FROM graft_stage.work.events_mcc")
      .collect()(0).getLong(0)
    require(cntClone == cntSrc,
      s"clone serves $cntClone rows vs the source snapshot's $cntSrc — " +
        "transplanted suppression state diverges")
    // the source moves on and hard-vacuums — the clone must not notice
    spark.sql(
      """INSERT OVERWRITE graft_stage.work.events_mcs
        |SELECT event_id, event_type, value FROM events_mc_src
        |WHERE event_id % 97 = 0""".stripMargin)
    spark.sql("CALL graft_stage.vacuum('work', 'events_mcs', 1)")
    require(spark.sql("SELECT count(*) FROM graft_stage.work.events_mcc")
      .collect()(0).getLong(0) == cntClone,
      "source vacuum changed what the clone serves")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_mcc
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** The patched surviving corpus recomputed from raw events — hash match
    * proves the transplanted descriptors ≡ the source's suppression state.
    */
  val q360Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value2")} AS total
       |FROM (
       |  SELECT event_id, event_type,
       |    CASE WHEN event_id % 10 = 7 THEN value + 100 ELSE value END AS value2
       |  FROM events
       |  WHERE event_id % 25 != 4)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q359

  /** CLONE SYNC THROUGH REWRITES (r14 — closes the boundary q354
    * declared: sync refused any source version that removed files). With
    * `keys => 'k1[,k2…]'` the pending range applies as the source's NET
    * row-level change feed ([[graft.sources.catalog.StagingMaintenance
    * .rowLevelChangesAt]] — deletes/inserts at changed-slice cost)
    * MERGEd into the clone by key: upserts for net inserts, deletes for
    * keys with no replacement. Key identity IS the follow semantic —
    * clone-divergent rows under other keys ride along untouched, and
    * appends after a CDF sync go back to zero-copy borrowing. At 100 TB:
    * a dev/backfill clone keeps following a production table through its
    * compactions and row-level fixes without ever re-copying the corpus —
    * each refresh costs the changed slices, not the table.
    *
    * The query clones an orders slice, diverges the clone, rewrites the
    * source (UPDATE + DELETE + append), proves the keyless refusal names
    * the keys escape, syncs with keys, re-syncs (idempotent no-op), and
    * aggregates the clone. Oracle recomputes the followed content plus
    * the divergent slice from raw orders.
    */
  def q359CdfSync(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cfs_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cfs_dst")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cfs_src")
    spark.sql(
      """CREATE TABLE graft_stage.work.cfs_src AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cfs_src WHERE o_orderkey % 3 = 0""".stripMargin)
    spark.sql("CALL graft_stage.clone('work', 'cfs_src', 'cfs_dst')")
    // divergent slice: disjoint keys, rides along through every sync
    spark.sql(
      """INSERT INTO graft_stage.work.cfs_dst
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cfs_src WHERE o_orderkey % 3 = 1""".stripMargin)
    // the source rewrites AND appends since the watermark
    spark.sql(
      """UPDATE graft_stage.work.cfs_src SET o_totalprice = o_totalprice + 100000
        |WHERE o_orderkey % 9 = 0""".stripMargin)
    spark.sql("DELETE FROM graft_stage.work.cfs_src WHERE o_orderkey % 9 = 3")
    spark.sql(
      """INSERT INTO graft_stage.work.cfs_src
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_cfs_src WHERE o_orderkey % 3 = 2""".stripMargin)
    // keyless sync must refuse and name the keys escape
    val refused =
      try { spark.sql("CALL graft_stage.sync('work', 'cfs_dst')").collect(); false }
      catch { case e: Exception => e.getMessage.contains("keys") }
    require(refused, "keyless sync across a rewrite must refuse with the keys hint")
    val r = spark.sql(
      "CALL graft_stage.sync('work', 'cfs_dst', keys => 'o_orderkey')").collect()(0)
    require(r.getLong(2) > 0L, s"CDF sync absorbed nothing: $r")
    val r2 = spark.sql(
      "CALL graft_stage.sync('work', 'cfs_dst', keys => 'o_orderkey')").collect()(0)
    require(r2.getLong(2) == 0L && r2.getLong(3) == -1L,
      s"CDF re-sync must be an idempotent no-op: $r2")
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.cfs_dst
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** The followed source state plus the divergent slice, recomputed from
    * raw orders — hash match proves CDF-driven sync ≡ keyed replay.
    */
  val q359Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("price2")} AS total
       |FROM (
       |  SELECT o_orderkey, o_orderstatus,
       |    CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 100000
       |         ELSE o_totalprice END AS price2
       |  FROM orders
       |  WHERE NOT (o_orderkey % 9 = 3))
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q358

  /** HISTORY PURGE UNDER DELETION VECTORS (r14 — closes the boundary q353
    * declared: purge used to refuse DV-carrying history and demand a
    * fold-vacuum-purge dance first). The descriptors every readable
    * manifest shares now FOLLOW the rewrite
    * ([[graft.sources.catalog.DeletionVectors.remapDvsForPurge]]):
    * equality descriptors substitute twin names (membership is by key),
    * position descriptors remap ordinals against the per-file purged row
    * indices — purged ordinals leave the set, later ordinals close ranks,
    * run bins rewrite under fresh names — all IN PLACE so every version
    * referencing a descriptor updates consistently. At 100 TB this is
    * what makes right-to-be-forgotten workable on a HIGH-CHURN corpus:
    * compliance deletes no longer wait for (or force) a table-wide fold,
    * and the extra cost over a plain purge is O(descriptor bytes + purged
    * ordinals of position-covered files).
    *
    * The query builds a keyless MOR corpus, lands a position-delta UPDATE
    * (run descriptor) and a selective DELETE (inline sidecar), then
    * purges a band that misses both the replaced and the deleted rows —
    * so every surviving descriptor ordinal must shift exactly. Requires
    * pin: descriptor names unchanged (in-place remap), rows_purged exact,
    * head and pre-delete time travel both exact after the remap. Oracle
    * recomputes the surviving patched corpus from raw events.
    */
  def q358PurgeUnderDvs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_pdv_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_pdv")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_pdv
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_pdv
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_pdv_src""".stripMargin)
    // v2: position-delta UPDATE — run descriptor; replaced rows (%10=7)
    // and their replacements are all OUTSIDE the purge band (%5=3)
    spark.sql(
      "UPDATE graft_stage.work.events_pdv SET value = value + 100 WHERE event_id % 10 = 7")
    // v3: selective DELETE — its ghosts (%25=4) are outside the band too,
    // so their ordinals must remap exactly or wrong rows go invisible
    spark.sql(
      "DELETE FROM graft_stage.work.events_pdv WHERE event_id % 25 = 4")
    def dvs(): Seq[String] = graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "events_pdv")
    val dvsBefore = dvs()
    require(dvsBefore.size == 2,
      s"expected the update + delete descriptors, got $dvsBefore")
    val expPurged = spark.sql(
      "SELECT count(*) FROM events_pdv_src WHERE event_id % 5 = 3")
      .collect()(0).getLong(0)
    val r = spark.sql(
      "CALL graft_stage.purge('work', 'events_pdv', 'event_id % 5 = 3')")
      .collect()(0)
    require(r.getLong(2) == expPurged,
      s"rows_purged ${r.getLong(2)} != expected $expPurged")
    require(dvs() == dvsBefore,
      s"purge must remap descriptors IN PLACE (names referenced by " +
        s"history): $dvsBefore -> ${dvs()}")
    val headCnt = spark.sql(
      "SELECT count(*) FROM graft_stage.work.events_pdv").collect()(0).getLong(0)
    val headExpect = spark.sql(
      """SELECT count(*) FROM events_pdv_src
        |WHERE event_id % 5 != 3 AND event_id % 25 != 4""".stripMargin)
      .collect()(0).getLong(0)
    require(headCnt == headExpect,
      s"head after purge-under-DVs serves $headCnt rows, expected $headExpect")
    val v2Cnt = spark.sql(
      "SELECT count(*) FROM graft_stage.work.events_pdv VERSION AS OF 2")
      .collect()(0).getLong(0)
    require(v2Cnt == expPurged * 4L,
      s"pre-delete time travel serves $v2Cnt rows, expected ${expPurged * 4L}")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_pdv
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** The surviving patched corpus recomputed from raw events — hash match
    * proves purge-under-DVs ≡ filter-then-patch on content.
    */
  val q358Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value2")} AS total
       |FROM (
       |  SELECT event_id, event_type,
       |    CASE WHEN event_id % 10 = 7 THEN value + 100 ELSE value END AS value2
       |  FROM events
       |  WHERE event_id % 5 != 3 AND event_id % 25 != 4)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q357

  /** BROAD-STATEMENT AUTO-FOLD (r14 — position-delta admission control):
    * the `graft.update.mode` escape hatch needs the operator to KNOW a
    * statement is bulk before running it, because DSv2 chooses the
    * row-level operation before any predicate is pushed, let alone
    * evaluated. `'graft.delta.auto-fold-fraction'=f` instead measures
    * AFTER the statement with exact information — the delta writers' own
    * per-file suppressed counts: a position-delta commit that covered
    * ≥ f of the snapshot's files AND suppressed ≥ f of the covered
    * files' rows triggers an immediate scoped fold (the
    * `CALL optimize(scope => 'deltas')` machinery: only covered files
    * rewrite, carried files move by name). The 90%-of-table keyless
    * UPDATE costs one extra pass over files it already touched instead
    * of leaving a table that suppresses most of every file forever;
    * selective statements skip at the free file-fraction gate (row
    * counts are only footer-read once a statement provably touched most
    * of the table). At 100 TB: bulk re-scores of a keyless corpus
    * self-compact; incremental patches stay O(changed rows).
    *
    * The query drives a bulk UPDATE (matches every row — required to
    * auto-fold: no active descriptors, fully-suppressed originals
    * retired from the head) then a selective UPDATE (required NOT to
    * fold: one run descriptor, zero rewrites) and aggregates the final
    * corpus; the oracle recomputes both patches from raw events.
    */
  def q357DeltaAutoFold(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_af_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_af")
    spark.sql(
      """CREATE TABLE graft_stage.work.events_af
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read',
        |  'graft.delta.auto-fold-fraction'='0.5')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.events_af
        |SELECT /*+ REPARTITION_BY_RANGE(8, event_id) */ event_id, event_type, value
        |FROM events_af_src""".stripMargin)
    import graft.sources.catalog.{StagingMaintenance, ZoneMapScan}
    val before = StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_af").toSet
    // BULK: every row matches (the modulo keeps it on the delta path) —
    // the statement must fold itself
    spark.sql(
      "UPDATE graft_stage.work.events_af SET value = value + 100 WHERE event_id % 2 >= 0")
    require(ZoneMapScan.lastDeltaAutoFold.isDefined,
      "bulk keyless UPDATE above the declared fraction did not auto-fold")
    val dvs1 = StagingMaintenance.activeDvs(spark, "graft_stage", "work", "events_af")
    require(dvs1.isEmpty, s"auto-fold left active descriptors: $dvs1")
    val after1 = StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "events_af").toSet
    require((before & after1).isEmpty,
      "fully-suppressed originals survived the auto-fold")
    // SELECTIVE: ~1% of rows — must NOT fold (descriptor stays, zero rewrites)
    spark.sql(
      "UPDATE graft_stage.work.events_af SET value = value + 10 WHERE event_id % 97 = 5")
    require(ZoneMapScan.lastDeltaAutoFold.isEmpty,
      "selective keyless UPDATE auto-folded — the admission gate is broken")
    val dvs2 = StagingMaintenance.activeDvs(spark, "graft_stage", "work", "events_af")
    require(dvs2.size == 1 && dvs2.head.startsWith("dvr-"),
      s"expected one run descriptor after the selective UPDATE, got $dvs2")
    require(after1.subsetOf(StagingMaintenance
        .currentFileNames(spark, "graft_stage", "work", "events_af").toSet),
      "selective position-delta UPDATE rewrote carried files")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_af
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Both patches recomputed from raw events — hash match proves
    * auto-fold ≡ the plain delta semantics it compacted.
    */
  val q357Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value2")} AS total
       |FROM (
       |  SELECT event_id, event_type,
       |    CASE WHEN event_id % 97 = 5 THEN value + 110
       |         ELSE value + 100 END AS value2
       |  FROM events)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q356

  /** EMBEDDING SNAPSHOT DRIFT AUDIT (r14 — the training-data-ops face of
    * time travel): a versioned embedding corpus answers "how far did each
    * label's centroid move between ingest waves?" with two TIME-TRAVEL
    * reads of the SAME table — `VERSION AS OF 1` vs the head — joined per
    * (label, dimension). This is the drift monitor an embedding pipeline
    * runs before retraining or re-clustering: at 100 TB both sides are
    * ordinary two-phase aggregations over their snapshots (zone maps and
    * column pruning apply; the deterministic sorted-fold here is the
    * oracle-exact twin of the q83-audited partial-sum scale path), and the
    * catalog serves both versions from one file set — no corpus copy per
    * wave. Oracle recomputes both waves' centroids from raw embeddings
    * (the v1 slice is vec_id-even by construction) — the hash match
    * proves time travel ≡ slice semantics through the whole pipeline.
    */
  def q356SnapshotDrift(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.embeddings(spark, dir)
      .createOrReplaceTempView("emb_sd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.emb_sd")
    spark.sql(
      """CREATE TABLE graft_stage.work.emb_sd AS
        |SELECT vec_id, embedding, label FROM emb_sd_src WHERE vec_id % 2 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.emb_sd
        |SELECT vec_id, embedding, label FROM emb_sd_src WHERE vec_id % 2 = 1""".stripMargin)
    def cent(face: String): String =
      s"""SELECT label, pos, count(1) AS n,
         |  aggregate(array_sort(collect_list(CAST(x AS DOUBLE))),
         |            CAST(0 AS DOUBLE), (acc, v) -> acc + v)
         |    / CAST(count(1) AS DOUBLE) AS c
         |FROM (SELECT label, pos, x
         |      FROM graft_stage.work.emb_sd $face
         |      LATERAL VIEW posexplode(embedding) pe AS pos, x)
         |WHERE pos < 8
         |GROUP BY label, pos""".stripMargin
    require(spark.sql("SELECT count(*) FROM graft_stage.work.emb_sd.snapshots")
      .collect()(0).getLong(0) == 2L, "expected exactly two ingest waves")
    spark.sql(
      s"""SELECT a.label, a.pos, a.n AS n1, b.n AS n2,
         |  ROUND(ABS(b.c - a.c), 9) AS drift
         |FROM (${cent("VERSION AS OF 1")}) a
         |JOIN (${cent("")}) b ON a.label = b.label AND a.pos = b.pos
         |ORDER BY a.label, a.pos""".stripMargin)
  }

  /** Both waves' centroids recomputed from raw embeddings (wave 1 =
    * vec_id-even) — hash match proves time-travel drift ≡ slice drift.
    */
  val q356Oracle: String =
    """WITH cent AS (
      |  SELECT ver, label, s.i - 1 AS pos, count(*) AS n,
      |    list_reduce([CAST(0 AS DOUBLE)] ||
      |        list(CAST(s.x AS DOUBLE) ORDER BY CAST(s.x AS DOUBLE)),
      |      (acc, v) -> acc + v) / CAST(count(*) AS DOUBLE) AS c
      |  FROM (SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 2 END AS slice,
      |          label, embedding FROM embeddings) e,
      |    (SELECT unnest([1, 2]) AS ver) v,
      |    LATERAL (SELECT unnest([{'i': i, 'x': e.embedding[i]}
      |                            for i in range(1, len(e.embedding) + 1)]) AS s)
      |  WHERE s.i <= 8 AND (v.ver = 2 OR e.slice = 1)
      |  GROUP BY ver, label, s.i)
      |SELECT a.label, a.pos, a.n AS n1, b.n AS n2,
      |  ROUND(ABS(b.c - a.c), 9) AS drift
      |FROM (SELECT * FROM cent WHERE ver = 1) a
      |JOIN (SELECT * FROM cent WHERE ver = 2) b
      |  ON a.label = b.label AND a.pos = b.pos
      |ORDER BY a.label, a.pos""".stripMargin

  // ---------------------------------------------------------------- q355

  /** DISTRIBUTED EQUALITY-DELETE KEY BINS (r14 — SURVEY r14 candidate #1,
    * the keyed twin of q350's position-run sidecars): a keyed-MOR DELETE
    * whose matched keys exceed `spark.graft.key-delete.max-inline-keys`
    * spills each TASK's keys to a bin under `_graft_dv/dvk-<token>/` and
    * the driver commits ONE descriptor naming the key column, covered
    * files, and bins — a 100M-key CDC retention burst never materializes
    * its key set on the driver (transient bound: tasks × cap). Reads
    * resolve the set IN THE EXECUTOR, cached per JVM by descriptor dir —
    * the Iceberg equality-delete read economy; maintenance reads (fold,
    * CDF, rewrites) suppress via a non-broadcast anti-join over bins
    * parsed in parallel; OPTIMIZE folds descriptors away and VACUUM
    * reclaims the dirs.
    *
    * The query drops the cap to force the distributed path at every SF,
    * deletes a top-quarter key band and an overlapping status slice
    * (ghosts never re-match), requires both commits took keyrun mode with
    * ZERO file changes, and aggregates survivors. Oracle recomputes from
    * raw orders — the hash match is the keyrun ≡ COW proof.
    */
  def q355DistributedKeyDeletes(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_kdd_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_kdd")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_kdd
        |  (o_orderkey BIGINT NOT NULL, o_orderstatus STRING, o_totalprice DOUBLE)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read',
        |  'graft.merge-keys'='o_orderkey')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_kdd
        |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */
        |  o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE)
        |FROM orders_kdd_src""".stripMargin)
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_kdd").toSet
    val hi = spark.sql("SELECT max(o_orderkey) FROM orders_kdd_src")
      .collect()(0).getLong(0)
    val lo3 = hi - hi / 4L
    val capKey = "spark.graft.key-delete.max-inline-keys"
    val savedCap = spark.conf.getOption(capKey)
    spark.conf.set(capKey, "64") // both deletes exceed this at every SF
    try {
      def mode(): Option[String] =
        graft.sources.catalog.ZoneMapScan.lastKeyDeleteMode
      spark.sql(s"DELETE FROM graft_stage.work.orders_kdd WHERE o_orderkey > $lo3")
      require(mode().contains("dv-keyrun"),
        s"over-cap keyed delete did not take the bin path: ${mode()}")
      // overlapping second delete: suppressed keys never re-match, and the
      // visible match stays over the cap at every SF
      spark.sql("DELETE FROM graft_stage.work.orders_kdd WHERE o_orderstatus = 'O'")
      require(mode().contains("dv-keyrun"),
        s"second over-cap delete fell off the bin path: ${mode()}")
      val after = graft.sources.catalog.StagingMaintenance
        .currentFileNames(spark, "graft_stage", "work", "orders_kdd").toSet
      require(before == after,
        s"distributed key deletes changed the file set: " +
          s"${(before diff after).size} gone, ${(after diff before).size} new")
      val dvs = graft.sources.catalog.StagingMaintenance
        .activeDvs(spark, "graft_stage", "work", "orders_kdd")
      require(dvs.size == 2 && dvs.forall(_.startsWith("dvk-")),
        s"expected two keyrun descriptors, got $dvs")
    } finally savedCap match {
      case Some(v) => spark.conf.set(capKey, v)
      case None    => spark.conf.unset(capKey)
    }
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.orders_kdd
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** Survivors recomputed from raw orders under both delete predicates —
    * hash match proves distributed-keyrun ≡ copy-on-write semantics.
    */
  val q355Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE NOT (o_orderkey >
       |    (SELECT max(o_orderkey) - max(o_orderkey) // 4 FROM orders))
       |  AND NOT (o_orderstatus = 'O')
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q354

  /** INCREMENTAL CLONE REFRESH (r14 — [[graft.sources.catalog.TableClone
    * .sync]]): `CALL sync(ns, clone)` absorbs the source versions
    * committed since the clone's watermark by BORROWING their newly-added
    * files — the same zero-copy mechanics as the clone itself, applied
    * incrementally. The clone-then-keep-fresh loop at 100 TB: each nightly
    * source append reaches every downstream clone as one manifest write,
    * O(new files), no data movement; the clone's own divergent writes ride
    * along untouched. Append-only by contract (a source rewrite refuses —
    * absorbing it would double borrowed rows), idempotent (re-absorption
    * dedups), crash-safe (manifest commits before the watermark advances).
    *
    * The query clones a one-slice orders table, appends two more slices to
    * the source, syncs (required: borrowed not copied — zero parquet files
    * in the clone dir; a second sync is a no-op), diverges the clone with
    * a fourth slice of its own, and aggregates the clone. Oracle
    * recomputes the four slices from raw orders.
    */
  def q354CloneSync(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_sy_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.sy_dst")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.sy_src")
    spark.sql(
      """CREATE TABLE graft_stage.work.sy_src AS
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_sy_src WHERE o_orderkey % 7 = 0""".stripMargin)
    spark.sql("CALL graft_stage.clone('work', 'sy_src', 'sy_dst')")
    Seq(3, 5).foreach(m => spark.sql(
      s"""INSERT INTO graft_stage.work.sy_src
         |SELECT o_orderkey, o_orderstatus, o_totalprice
         |FROM orders_sy_src WHERE o_orderkey % 7 = $m""".stripMargin))
    val r = spark.sql("CALL graft_stage.sync('work', 'sy_dst')").collect()(0)
    require(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) > 0L,
      s"sync absorbed nothing: $r")
    val fs = new org.apache.hadoop.fs.Path(stageRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$stageRoot/work/sy_dst"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "sync copied data files — refresh must borrow, not copy")
    val r2 = spark.sql("CALL graft_stage.sync('work', 'sy_dst')").collect()(0)
    require(r2.getLong(2) == 0L && r2.getLong(3) == -1L,
      s"sync is not idempotent: $r2")
    spark.sql(
      """INSERT INTO graft_stage.work.sy_dst
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders_sy_src WHERE o_orderkey % 7 = 6""".stripMargin)
    spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.sy_dst
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  /** The clone's four slices (one original, two synced, one divergent)
    * recomputed from raw orders — hash match proves zero-copy incremental
    * refresh is lossless.
    */
  val q354Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderkey % 7 IN (0, 3, 5, 6)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q353

  /** COMPLIANCE PURGE ACROSS HISTORY (r14 —
    * [[graft.sources.catalog.StagingPurge]]): `CALL purge(ns, t, where)`
    * physically removes matching rows from EVERY readable version — head,
    * time travel, tags, branches — while the version history itself
    * survives. DELETE cannot be this operation: it commits a NEW version
    * and the rows stay readable (and on disk) through `VERSION AS OF`
    * until retention lapses; compliance clocks don't wait for retention.
    * VACUUM forgets versions, purge forgets ROWS.
    *
    * Scale story, proven by the requires: the rewrite is zone-map-scoped
    * — the table is laid out as two range-disjoint versions, the purge
    * band lives entirely in the second, and the first version's manifest
    * and files must come through UNTOUCHED (`versions_touched == 1`, file
    * list identical). At 100 TB, purging a user's slice rewrites the
    * files that can hold it, never the corpus. The time-travel require
    * proves the point of the operation: the v1 snapshot no longer serves
    * the purged band either, yet history length is unchanged.
    *
    * Oracle recomputes the surviving corpus from raw events — the hash
    * match proves purge ≡ filter across the whole content.
    */
  def q353HistoryPurge(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_prg_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.events_prg")
    val hi = spark.sql("SELECT max(event_id) FROM events_prg_src")
      .collect()(0).getLong(0)
    val mid = hi / 2L
    val lo3 = hi - hi / 4L // purge band: the top quarter, all inside v2
    spark.sql(
      s"""CREATE TABLE graft_stage.work.events_prg AS
         |SELECT /*+ REPARTITION_BY_RANGE(4, event_id) */ event_id, event_type, value
         |FROM events_prg_src WHERE event_id <= $mid""".stripMargin)
    spark.sql(
      s"""INSERT INTO graft_stage.work.events_prg
         |SELECT /*+ REPARTITION_BY_RANGE(4, event_id) */ event_id, event_type, value
         |FROM events_prg_src WHERE event_id > $mid""".stripMargin)
    graft.sources.catalog.StagingMaintenance.analyze(
      spark, "graft_stage", "work", "events_prg", Seq("event_id"))
    def v1Files(): Seq[String] = spark.sql(
      "SELECT file FROM graft_stage.work.events_prg.files VERSION AS OF 1")
      .collect().map(_.getString(0)).toSeq.sorted
    val v1Before = v1Files()
    val expectPurged = spark.sql(
      s"SELECT count(*) FROM events_prg_src WHERE event_id > $lo3")
      .collect()(0).getLong(0)
    val r = spark.sql(
      s"CALL graft_stage.purge('work', 'events_prg', 'event_id > $lo3')")
      .collect()(0)
    require(r.getLong(2) == expectPurged,
      s"rows_purged ${r.getLong(2)} != expected $expectPurged")
    require(r.getInt(3) == 1,
      s"purge touched ${r.getInt(3)} manifests — the zone-map scope should " +
        "confine the band to v2's manifest alone")
    require(v1Files() == v1Before,
      "zone-scoped purge rewrote v1's files — the band provably lives in v2")
    val v1Cnt = spark.sql(
      "SELECT count(*) FROM graft_stage.work.events_prg VERSION AS OF 1")
      .collect()(0).getLong(0)
    val v1Expect = spark.sql(
      s"SELECT count(*) FROM events_prg_src WHERE event_id <= $mid AND NOT (event_id > $lo3)")
      .collect()(0).getLong(0)
    require(v1Cnt == v1Expect,
      s"time-travel after purge: v1 serves $v1Cnt rows, expected $v1Expect")
    require(spark.sql("SELECT count(*) FROM graft_stage.work.events_prg.snapshots")
      .collect()(0).getLong(0) == 2L, "purge must not shorten history")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.events_prg
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** The surviving corpus recomputed from raw events — hash match proves
    * history purge ≡ filter on content.
    */
  val q353Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE NOT (event_id >
       |    (SELECT max(event_id) - max(event_id) // 4 FROM events))
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The clone's three slices recomputed from raw orders — hash match
    * proves zero-copy clone + divergence + source vacuum changed nothing
    * the clone serves.
    */
  val q352Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  ${graft.operators.Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderkey % 7 IN (0, 3, 5)
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** The patched corpus recomputed from raw events: +100 on the %5=2 band,
    * +10 more where that band is clicks, %97=3 re-typed 'patched' — hash
    * match proves keyless position-delta UPDATE/MERGE ≡ the equivalent
    * full recompute.
    */
  val q351Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value2")} AS total
       |FROM (
       |  SELECT event_id,
       |    CASE WHEN event_id % 97 = 3 THEN 'patched' ELSE event_type END
       |      AS event_type,
       |    CASE WHEN event_id % 5 = 2 AND event_type = 'click'
       |           THEN value + 110
       |         WHEN event_id % 5 = 2 THEN value + 100
       |         ELSE value END AS value2
       |  FROM events)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Survivors recomputed from raw events under both delete predicates —
    * hash match proves distributed-run-DV ≡ copy-on-write semantics.
    */
  val q350Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE NOT (event_id >
       |    (SELECT max(event_id) - max(event_id) // 4 FROM events))
       |  AND NOT (event_type = 'view')
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Survivors recomputed from raw events under both delete predicates —
    * hash match proves position-MOR ≡ copy-on-write delete semantics.
    */
  val q331Oracle: String =
    s"""SELECT event_type, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE NOT (event_id <= (SELECT max(event_id) FROM events) // 4)
       |  AND NOT (event_type = 'click')
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q329_tag_change_feed", q329TagChangeFeed, q329Oracle),
    GraftQuery.sql("q328_version_tags", q328VersionTags, q328Oracle),
    GraftQuery.sql("q327_bm25_index", q327Bm25Index, q327Oracle),
    GraftQuery.sql("q326_sorted_append", q326SortedAppend, q326Oracle),
    GraftQuery.sql("q323_bounded_mor_merge", q323BoundedMorMerge, q323Oracle),
    GraftQuery.sql("q318_merge_on_read", q318MergeOnRead, q318Oracle),
    GraftQuery.sql("q319_days_partition", q319DaysPartition, q319Oracle),
    GraftQuery.sql("q320_bucket_partition", q320BucketPartition, q320Oracle),
    GraftQuery.sql("q321_type_widening", q321TypeWidening, q321Oracle),
    GraftQuery.sql("q322_zorder_cluster", q322ZorderCluster, q322Oracle),
    GraftQuery.sql("q200_pushed_agg", q200PushedAgg, q200Oracle),
    GraftQuery.sql("q204_catalog_sql", q204CatalogSql, q204Oracle),
    GraftQuery.sql("q231_sink_roundtrip", q231SinkRoundtrip, q231Oracle),
    GraftQuery.sql("q232_spj_bucket_join", q232SpjBucketJoin, q232Oracle),
    GraftQuery.sql("q241_catalog_write", q241CatalogWrite, q241Oracle),
    GraftQuery.sql("q246_ivf_catalog_index", q246IvfCatalogIndex, Similarity.q67Oracle),
    GraftQuery.sql("q248_time_travel", q248TimeTravel, q248Oracle),
    GraftQuery.sql("q250_optimize_compact", q250OptimizeCompact, q250Oracle),
    GraftQuery.sql("q251_change_feed", q251ChangeFeed, q251Oracle),
    GraftQuery.sql("q253_zonemap_scan", q253ZoneMapScan, q253Oracle),
    GraftQuery.sql("q256_incremental_mv", q256IncrementalMv, q256Oracle),
    GraftQuery.sql("q257_clustered_layout", q257ClusteredLayout, q257Oracle),
    GraftQuery.sql("q261_sql_delete", q261SqlDelete, q261Oracle),
    GraftQuery.sql("q263_footer_agg", q263FooterAgg, q263Oracle),
    GraftQuery.sql("q271_sql_update", q271SqlUpdate, q271Oracle),
    GraftQuery.sql("q272_merge_into", q272MergeInto, q272Oracle),
    GraftQuery.sql("q273_table_history", q273TableHistory, q273Oracle),
    GraftQuery.sql("q277_conjunctive_scan", q277ConjunctiveScan, q277Oracle),
    GraftQuery.sql("q278_ivf_catalog_nprobe2", q278IvfCatalogNprobe2, Similarity.q84Oracle),
    GraftQuery.sql("q279_ts_zonemap_slice", q279TsZoneMapSlice, q279Oracle),
    GraftQuery.sql("q284_file_granular_delete", q284FileGranularDelete, q284Oracle),
    GraftQuery.sql("q285_string_zonemap", q285StringZonemap, q285Oracle),
    GraftQuery.sql("q292_sql_maintenance", q292SqlMaintenance, q292Oracle),
    GraftQuery.sql("q296_merge_full_sync", q296MergeFullSync, q296Oracle),
    GraftQuery.sql("q301_file_granular_update", q301FileGranularUpdate, q301Oracle),
    GraftQuery.sql("q302_file_granular_merge", q302FileGranularMerge, q302Oracle),
    GraftQuery.sql("q303_ivfpq_serve", q303IvfPqServe, Similarity.q264Oracle),
    GraftQuery.sql("q304_partitioned_table", q304PartitionedTable, q304Oracle),
    GraftQuery.sql("q305_row_level_diff", q305RowLevelDiff, q305Oracle),
    GraftQuery.sql("q306_null_pruned_scan", q306NullPrunedScan, q306Oracle),
    GraftQuery.sql("q307_bloom_lookup", q307BloomLookup, q307Oracle),
    GraftQuery.sql("q308_restore_rollback", q308RestoreRollback, q308Oracle),
    GraftQuery.sql("q309_check_constraint", q309CheckConstraint, q309Oracle),
    GraftQuery.sql("q313_catalog_functions", q313CatalogFunctions, q313Oracle),
    GraftQuery.sql("q315_insert_overwrite", q315InsertOverwrite, q315Oracle),
    GraftQuery.sql("q317_default_columns", q317DefaultColumns, q317Oracle),
    GraftQuery.sql("q330_write_audit_publish", q330WriteAuditPublish, q330Oracle),
    GraftQuery.sql("q331_position_deletes", q331PositionDeletes, q331Oracle),
    GraftQuery.sql("q332_branch_merge_publish", q332BranchMergePublish, q332Oracle),
    GraftQuery.sql("q333_commit_groups", q333CommitGroups, q333Oracle),
    GraftQuery.sql("q334_branch_rebase", q334BranchRebase, q334Oracle),
    GraftQuery.sql("q335_row_lineage", q335RowLineage, q335Oracle),
    GraftQuery.sql("q336_spj_catalog", q336SpjCatalog, q336Oracle),
    GraftQuery.sql("q337_partition_evolution", q337PartitionEvolution, q337Oracle),
    GraftQuery.sql("q339_metadata_tables", q339MetadataTables, q339Oracle),
    GraftQuery.sql("q340_spj_identity_agg", q340SpjIdentityAgg, q340Oracle),
    GraftQuery.sql("q341_auto_analyze", q341AutoAnalyze, q341Oracle),
    GraftQuery.sql("q343_mor_row_lineage", q343MorRowLineage, q343Oracle),
    GraftQuery.sql("q344_spj_compat_buckets", q344SpjCompatBuckets, q344Oracle),
    GraftQuery.sql("q345_spj_string_identity", q345SpjStringIdentity, q345Oracle),
    GraftQuery.sql("q346_small_file_compaction", q346SmallFileCompaction, q346Oracle),
    GraftQuery.sql("q348_where_scoped_optimize", q348WhereScopedOptimize, q348Oracle),
    GraftQuery.sql("q349_batch_change_feed", q349BatchChangeFeed, q349Oracle),
    GraftQuery.sql("q350_distributed_pos_deletes", q350DistributedPosDeletes, q350Oracle),
    GraftQuery.sql("q351_keyless_pos_delta", q351KeylessPosDelta, q351Oracle),
    GraftQuery.sql("q352_shallow_clone", q352ShallowClone, q352Oracle),
    GraftQuery.sql("q353_history_purge", q353HistoryPurge, q353Oracle),
    GraftQuery.sql("q354_clone_sync", q354CloneSync, q354Oracle),
    GraftQuery.sql("q355_distributed_key_deletes", q355DistributedKeyDeletes, q355Oracle),
    GraftQuery.sql("q356_snapshot_drift", q356SnapshotDrift, q356Oracle),
    GraftQuery.sql("q357_delta_autofold", q357DeltaAutoFold, q357Oracle),
    GraftQuery.sql("q358_purge_under_dvs", q358PurgeUnderDvs, q358Oracle),
    GraftQuery.sql("q359_cdf_sync", q359CdfSync, q359Oracle),
    GraftQuery.sql("q360_mor_clone", q360MorClone, q360Oracle))

  // ---------------------------------------------------------------- q332

  /** BRANCH-SIDE DML (r11 — Iceberg-branch parity): the write-audit-publish
    * pipeline that must FIX its candidate corpus before publish, without
    * rebuilding the branch and without publishing dirty. q330 proved
    * append→audit→publish; this adds the realistic middle step — ingest is
    * messy (a fresh slice PLUS re-deliveries that "correct" existing keys,
    * landing duplicate keys on the branch), and a MERGE ON THE BRANCH FACE
    * dedups it in place:
    *
    *   - branch 'fix' forks main (a quarter of orders),
    *   - two branch appends land the next slice and the corrections,
    *   - `MERGE INTO …branch_fix` (self-sourced: the duplicated keys with
    *     their winning value) DELETEs the stale sibling of every duplicated
    *     key — a rewrite version in the BRANCH log, main untouched (the
    *     in-query requires pin main's rows AND head version across all four
    *     branch commits),
    *   - the audit (zero duplicate keys) gates `CALL publish`, which
    *     fast-forwards the append AND rewrite manifests onto main verbatim.
    *
    * The oracle recomputes the dedup-then-publish result straight from
    * `orders` — a hash match proves branch DML + publish is exactly the
    * upsert it claims to be.
    */
  def q332BranchMergePublish(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_bdml_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_bdml")
    spark.sql( // standing corpus: a quarter of orders
      """CREATE TABLE graft_stage.work.orders_bdml AS
        |SELECT o_orderkey AS k, o_custkey AS v
        |FROM orders_bdml_src WHERE o_orderkey % 4 = 1""".stripMargin)
    val mainRows = spark.sql("SELECT count(*) FROM graft_stage.work.orders_bdml")
      .collect()(0).getLong(0)
    spark.sql("CALL graft_stage.branch('work', 'orders_bdml', 'fix')")
    spark.sql( // candidate slice
      """INSERT INTO graft_stage.work.orders_bdml.branch_fix
        |SELECT o_orderkey, o_custkey
        |FROM orders_bdml_src WHERE o_orderkey % 4 = 2""".stripMargin)
    spark.sql( // re-delivered corrections of existing keys → duplicate keys
      // -(v+1), not -v: a correction must DIFFER from the original for every
      // row (o_custkey = 0 exists in the data — plain negation would land an
      // indistinguishable duplicate no row-level op on a keyless table could
      // separate)
      """INSERT INTO graft_stage.work.orders_bdml.branch_fix
        |SELECT o_orderkey, -(o_custkey + 1)
        |FROM orders_bdml_src WHERE o_orderkey % 8 = 1""".stripMargin)
    // branch MERGE dedup: each duplicated key keeps its correction (min v)
    spark.sql(
      """MERGE INTO graft_stage.work.orders_bdml.branch_fix t USING (
        |  SELECT k, min(v) AS v FROM graft_stage.work.orders_bdml.branch_fix
        |  GROUP BY k HAVING count(*) > 1) s
        |ON t.k = s.k
        |WHEN MATCHED AND t.v <> s.v THEN DELETE""".stripMargin)
    // WAP isolation held across appends AND the branch rewrite
    require(spark.sql("SELECT count(*) FROM graft_stage.work.orders_bdml")
      .collect()(0).getLong(0) == mainRows,
      "branch DML leaked rows into main before publish")
    val (headV, _, _, _, _, _, _) = graft.sources.catalog.StagingMaintenance
      .detail(spark, "graft_stage", "work", "orders_bdml")
    require(headV == 1L, s"branch DML advanced main's head to $headV")
    // audit gate: the branch must hold zero duplicate keys before publish
    val dups = spark.sql(
      """SELECT count(*) - count(DISTINCT k)
        |FROM graft_stage.work.orders_bdml.branch_fix""".stripMargin)
      .collect()(0).getLong(0)
    require(dups == 0L, s"audit failed: $dups duplicate keys — would drop_branch")
    spark.sql("CALL graft_stage.publish('work', 'orders_bdml', 'fix')")
    spark.sql(
      """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  sum(v) AS sum_v
        |FROM graft_stage.work.orders_bdml
        |GROUP BY k % 7 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q333

  /** CROSS-TABLE COMMIT GROUPS (r11): the multi-table serving stacks this
    * engine builds (bm25_postings+bm25_doclen, the PQ trio) are only as
    * consistent as their publication — single-table commits are atomic,
    * but a writer crash BETWEEN member INSERTs used to leave a torn
    * combination papered over by an in-process guard. The group manifest
    * ([[graft.sources.catalog.CommitGroups]]) is the two-phase fix: member
    * commits are invisible phase-1 work; one create-exclusive
    * `g-<seq>.json` binds the (table → version) vector, and every reader
    * of a member resolves AT that vector.
    *
    * The query drives a derived serving pair (facts + their per-group
    * aggregate, the postings/doclen shape) through two ingest slices with
    * a SIMULATED WRITER DEATH between the second slice's member commits:
    * in-query requires pin that the half-committed pair stayed invisible
    * (the fact member's read held the previous vector even though its head
    * advanced), then the retry completes phase 1 and publishes. The final
    * SELECT joins the two members; the oracle recomputes both from raw
    * orders — a hash match proves group-governed reads are exactly the
    * consistent two-slice state, with the torn intermediate never
    * observable.
    */
  def q333CommitGroups(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cg_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cg_fact")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cg_agg")
    spark.sql( // slice 0 of the fact member
      """CREATE TABLE graft_stage.work.cg_fact AS
        |SELECT o_orderkey AS k, o_custkey AS v
        |FROM orders_cg_src WHERE o_orderkey % 3 = 0""".stripMargin)
    spark.sql( // slice 0 of its serving aggregate (derived, must stay in step)
      """CREATE TABLE graft_stage.work.cg_agg AS
        |SELECT o_orderkey % 11 AS g, count(*) AS cnt
        |FROM orders_cg_src WHERE o_orderkey % 3 = 0 GROUP BY o_orderkey % 11""".stripMargin)
    spark.sql("CALL graft_stage.group_create('work', 'cg', 'cg_fact,cg_agg')")
    val slice0 = spark.sql("SELECT count(*) FROM graft_stage.work.cg_fact")
      .collect()(0).getLong(0)
    // slice 1, phase 1 — the fact member commits, then the writer "dies"
    spark.sql(
      """INSERT INTO graft_stage.work.cg_fact
        |SELECT o_orderkey, o_custkey
        |FROM orders_cg_src WHERE o_orderkey % 3 = 1""".stripMargin)
    // the commit is REAL (the member's head advanced) …
    val (headV, _, _, _, _, _, _) = graft.sources.catalog.StagingMaintenance
      .detail(spark, "graft_stage", "work", "cg_fact")
    require(headV == 2L, s"fact member's phase-1 commit missing: head $headV")
    // … but NO reader sees it: the group still serves the slice-0 vector
    require(spark.sql("SELECT count(*) FROM graft_stage.work.cg_fact")
      .collect()(0).getLong(0) == slice0,
      "torn pair visible: fact member exposed an unpublished slice")
    // the restarted writer completes phase 1 and publishes ONCE
    spark.sql(
      """INSERT INTO graft_stage.work.cg_agg
        |SELECT o_orderkey % 11 AS g, count(*) AS cnt
        |FROM orders_cg_src WHERE o_orderkey % 3 = 1 GROUP BY o_orderkey % 11""".stripMargin)
    spark.sql("CALL graft_stage.group_publish('work', 'cg')")
    // serve from BOTH members — consistent by construction, oracle-checked
    spark.sql(
      """SELECT a.g, CAST(sum(a.cnt) AS BIGINT) AS agg_cnt, f.fact_cnt,
        |  f.min_k, f.max_k
        |FROM graft_stage.work.cg_agg a
        |JOIN (SELECT k % 11 AS g, count(*) AS fact_cnt, min(k) AS min_k,
        |        max(k) AS max_k
        |      FROM graft_stage.work.cg_fact GROUP BY k % 11) f
        |  ON a.g = f.g
        |GROUP BY a.g, f.fact_cnt, f.min_k, f.max_k
        |ORDER BY g""".stripMargin)
  }

  /** Both members recomputed from raw orders over the two published
    * slices: the aggregate member summed across its two slice rows per
    * group must equal the fact member's own per-group count.
    */
  val q333Oracle: String =
    """WITH sl AS (
      |  SELECT o_orderkey AS k, o_custkey AS v FROM orders
      |  WHERE o_orderkey % 3 <= 1)
      |SELECT k % 11 AS g, CAST(count(*) AS BIGINT) AS agg_cnt,
      |  CAST(count(*) AS BIGINT) AS fact_cnt,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM sl GROUP BY k % 11 ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- q334

  /** BRANCH REBASE (r11): publish is fast-forward-only by design — a main
    * commit landing after the fork makes the branch's snapshots stale, and
    * copying them verbatim would silently drop main's commit. Before
    * rebase, that single commit permanently STRANDED the branch: the only
    * way out was drop + rebuild. This query drives the real recovery path:
    *
    *   - standing corpus (¼ of orders), branch 'retry' forks it,
    *   - branch ingest + corrections + a branch MERGE dedup (a REWRITE
    *     delta — the hard case: the branch rewrote one of the fork's
    *     files),
    *   - a concurrent writer lands a slice ON MAIN → the branch is
    *     stranded: `CALL publish` must CONFLICT (required, caught),
    *   - `CALL rebase` re-derives each branch commit as a file-set delta,
    *     proves file-granular serializability over main's append (an
    *     append never overlaps a branch rewrite), and replays the deltas
    *     as fresh snapshots computed from main's head, renumbered past it,
    *   - publish now fast-forwards; main = its own slice ∪ the branch's
    *     deduped corpus, nothing dropped on either side.
    *
    * The oracle recomputes the three-way union with corrections straight
    * from `orders` — a hash match proves rebase loses neither main's
    * post-fork commit nor any branch delta, including the rewrite.
    */
  def q334BranchRebase(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_rb_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_rb")
    spark.sql( // standing corpus: a quarter of orders
      """CREATE TABLE graft_stage.work.orders_rb AS
        |SELECT o_orderkey AS k, o_custkey AS v
        |FROM orders_rb_src WHERE o_orderkey % 4 = 1""".stripMargin)
    spark.sql("CALL graft_stage.branch('work', 'orders_rb', 'retry')")
    spark.sql( // branch ingest: the next slice
      """INSERT INTO graft_stage.work.orders_rb.branch_retry
        |SELECT o_orderkey, o_custkey
        |FROM orders_rb_src WHERE o_orderkey % 4 = 2""".stripMargin)
    spark.sql( // re-delivered corrections of existing keys → duplicate keys
      """INSERT INTO graft_stage.work.orders_rb.branch_retry
        |SELECT o_orderkey, -(o_custkey + 1)
        |FROM orders_rb_src WHERE o_orderkey % 8 = 1""".stripMargin)
    // branch MERGE dedup (keeps each duplicated key's correction, min v) —
    // this REWRITES one of the fork's files, the delta kind rebase must
    // prove serializable and replay
    spark.sql(
      """MERGE INTO graft_stage.work.orders_rb.branch_retry t USING (
        |  SELECT k, min(v) AS v FROM graft_stage.work.orders_rb.branch_retry
        |  GROUP BY k HAVING count(*) > 1) s
        |ON t.k = s.k
        |WHEN MATCHED AND t.v <> s.v THEN DELETE""".stripMargin)
    // …meanwhile a concurrent writer lands a slice ON MAIN: the branch is
    // now STRANDED (fork=1, main=2)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_rb
        |SELECT o_orderkey, o_custkey
        |FROM orders_rb_src WHERE o_orderkey % 4 = 3""".stripMargin)
    // fast-forward publish MUST refuse — silently dropping main's slice is
    // the failure mode rebase exists to prevent
    val refused =
      try { spark.sql("CALL graft_stage.publish('work', 'orders_rb', 'retry')"); false }
      catch { case e: Throwable =>
        Option(e.getMessage).exists(_.contains("publish conflict")) ||
          Option(e.getCause).flatMap(c => Option(c.getMessage))
            .exists(_.contains("publish conflict")) }
    require(refused, "publish fast-forwarded over main's post-fork commit")
    val newFork = spark.sql("CALL graft_stage.rebase('work', 'orders_rb', 'retry')")
      .collect()(0).getLong(1)
    require(newFork == 2L, s"rebase re-anchored at $newFork, expected main's head 2")
    spark.sql("CALL graft_stage.publish('work', 'orders_rb', 'retry')")
    spark.sql(
      """SELECT k % 5 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  sum(v) AS sum_v
        |FROM graft_stage.work.orders_rb
        |GROUP BY k % 5 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q335

  /** ROW LINEAGE (r11 — the Iceberg-v3 / Delta-row-tracking surface): every
    * row of a `'graft.row-lineage'='true'` table carries a table-unique,
    * STABLE `_row_id` — assigned as pure manifest arithmetic at commit
    * (per-file base + parquet row_index; zero data I/O), materialized into
    * a physical column by identity-preserving rewrites
    * ([[graft.sources.catalog.RowLineage]]). The provenance key a 100 TB
    * training pipeline wants on every example, and the identity an
    * incremental consumer needs to recognize "the same row" across layout
    * changes.
    *
    * The query drives the lifecycle on an orders-derived corpus and PINS
    * the identity contract with in-query requires (ids are
    * assignment-order-dependent, so the ORACLE can't see them — the
    * requires are the lineage proof; the final SELECT is plain data DuckDB
    * recomputes):
    *
    *   - CTAS + INSERT: every row gets a unique id (count == distinct),
    *   - OPTIMIZE (clustered compaction): the full (id, key)-binding
    *     checksum is IDENTICAL before and after — identity survived the
    *     rewrite physically,
    *   - a ranged COW DELETE: survivors keep their ids (the same checksum
    *     restricted to survivors matches), deleted ids vanish,
    *   - a group-based UPDATE (Spark's replacement write): `_row_id` rides
    *     the operation as a PRESERVED metadata projection
    *     (requiredMetadataAttributes + DataWriter.write(meta, data)), so
    *     even the rows the UPDATE rewrites keep their identity — the
    *     binding checksum is bit-identical across the rewrite,
    *   - the ids ride a plain parquet scan (broadcast base-map join +
    *     one projection — full pushdown preserved), and `SELECT _row_id`
    *     works in plain SQL (DSv2 metadata column).
    */
  def q335RowLineage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, countDistinct, count => fcount, sum => fsum}
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_rl_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_rl")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_rl
        |TBLPROPERTIES ('graft.row-lineage'='true')
        |AS SELECT o_orderkey AS k, o_custkey AS v
        |FROM orders_rl_src WHERE o_orderkey % 3 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.orders_rl
        |SELECT o_orderkey, o_custkey
        |FROM orders_rl_src WHERE o_orderkey % 3 = 1""".stripMargin)
    def lineage() = graft.sources.catalog.StagingMaintenance
      .readLineage(spark, "graft_stage", "work", "orders_rl")
    // (id, key)-binding checksum: equal sums of id and id·f(k) over equal
    // row counts pin the exact id-to-row assignment, not just the id SET
    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long, BigDecimal, BigDecimal) = {
      val r = df.agg(
        fcount(col("k")), countDistinct(col("_row_id")),
        fsum(col("_row_id").cast("decimal(38,0)")),
        fsum(col("_row_id").cast("decimal(38,0)") * (col("k") % 97 + 1))).collect()(0)
      (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))
    }
    val pre = sums(lineage())
    require(pre._1 == pre._2, s"row ids not unique: ${pre._1} rows, ${pre._2} ids")
    // clustered compaction MUST preserve identity (materialized physically)
    graft.sources.catalog.StagingMaintenance.optimize(spark,
      "graft_stage", "work", "orders_rl", targetFiles = 4, clusterBy = Some("k"))
    val post = sums(lineage())
    require(post == pre, s"OPTIMIZE re-identified rows: $pre -> $post")
    // ranged COW DELETE: survivors keep their ids bit-for-bit
    val preSurvivors = sums(lineage().where(col("k") >= 500))
    spark.sql("DELETE FROM graft_stage.work.orders_rl WHERE k < 500")
    val afterDel = sums(lineage())
    require(afterDel == preSurvivors,
      s"DELETE re-identified survivors: $preSurvivors -> $afterDel")
    // group-based UPDATE (Spark's replacement write): the operation carries
    // `_row_id` as a preserved metadata projection, so UPDATED rows KEEP
    // their identity — keys unchanged, values flipped, the (id,key)-binding
    // checksum must be bit-identical
    spark.sql("UPDATE graft_stage.work.orders_rl SET v = -(v + 1) WHERE k % 11 = 3")
    val afterUpd = sums(lineage())
    require(afterUpd == afterDel,
      s"UPDATE re-identified rows it rewrote: $afterDel -> $afterUpd")
    spark.sql(
      """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  sum(v) AS sum_v
        |FROM graft_stage.work.orders_rl
        |GROUP BY k % 7 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q336

  /** STORAGE-PARTITIONED JOIN over the staging catalog's bucket layout
    * (r11 — Iceberg SPJ parity on REAL parquet tables; q232 is the same
    * surface on the synthetic SeqSource): two tables `PARTITIONED BY
    * (bucket(8, k))`, bedded into their `k_bucket=<r>/` directories by
    * OPTIMIZE, join on `k` with ZERO Exchange. The scan proves the layout
    * from the manifest alone (every planned file in a bucket dir), groups
    * splits one-per-residue with their partition keys, and reports
    * `KeyGroupedPartitioning(bucket(8, k))`; the transform resolves
    * through the catalog's own `bucket` V2 function
    * ([[graft.sources.catalog.StagingFunctions]]), whose semantics are
    * bit-identical to the layout's mod_bucket residue. At 100 TB this is
    * the difference between shuffling BOTH fact tables and an
    * embarrassingly parallel per-bucket zip — the join cost a lakehouse
    * buys by paying the layout once at write time. The in-query require
    * pins the exchange-free executed plan AND a checksum equality under
    * it; the stray-append fallback (report withdrawn, plan shuffles,
    * result identical) is CatalogSpec's.
    */
  def q336SpjCatalog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    // opt-in only for the duration of this query (restored in the finally
    // below): the flag only activates for scans that REPORT a key-grouped
    // layout, but leaving it set would leak into later bench queries' plans
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_spj_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.spj_a")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.spj_b")
    spark.sql(
      """CREATE TABLE graft_stage.work.spj_a (k BIGINT, cust BIGINT)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(
      "INSERT INTO graft_stage.work.spj_a SELECT o_orderkey, o_custkey FROM orders_spj_src")
    spark.sql(
      """CREATE TABLE graft_stage.work.spj_b (k BIGINT, price_cents BIGINT)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.spj_b
        |SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
        |FROM orders_spj_src WHERE o_orderkey % 2 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "spj_a", partitionBy = Some("bucket(8,k)"))
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "spj_b", partitionBy = Some("bucket(8,k)"))
    // prove the exchange-free plan with broadcast off (a dim-sized test
    // table would otherwise broadcast; at fact scale SPJ is the only
    // shuffle-free plan) — conf restored before returning
    val joinSql =
      """SELECT a.k % 9 AS g, count(*) AS n, CAST(sum(a.cust) AS BIGINT) AS sum_cust,
        |  CAST(sum(b.price_cents) AS BIGINT) AS sum_cents
        |FROM graft_stage.work.spj_a a JOIN graft_stage.work.spj_b b ON a.k = b.k
        |GROUP BY a.k % 9 ORDER BY g""".stripMargin
    val oldBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the bare join: under SPJ its whole subtree is exchange-free (the
      // final per-group rollup above it may still shuffle its few rows)
      val j = spark.sql(
        """SELECT a.k, a.cust, b.price_cents
          |FROM graft_stage.work.spj_a a JOIN graft_stage.work.spj_b b ON a.k = b.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"bucket⋈bucket catalog join planned a shuffle:\n$plan")
      // execute under the SPJ plan: the row checksum pins the zip's exactness
      val n = j.agg(fsum(col("cust") * (col("k") % 97))).collect()(0).getLong(0)
      require(n != 0, "SPJ join checksum empty")
      // materialize the reported rollup UNDER the SPJ session so the
      // returned frame's lineage is conf-independent
      spark.sql(joinSql).localCheckpoint(eager = true)
    } finally {
      oldBc match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  /** The bucketed join recomputed from raw orders: every order joins its
    * even-keyed twin, grouped on the key residue.
    */
  val q336Oracle: String =
    """SELECT o_orderkey % 9 AS g, count(*) AS n,
      |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders WHERE o_orderkey % 2 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q337

  /** PARTITION-SPEC EVOLUTION (r11 — Iceberg's signature layout feature,
    * re-derived for the path-carried layout): a time-partitioned event
    * table re-declares itself key-bucketed WITHOUT rewriting a byte.
    * `CALL set_partition_spec` RETIRES `days(ts)` and declares
    * `bucket(8, user_id)`; old files stay in their `ts_day=` directories
    * and keep pruning through the retired spec (the per-file path pruner
    * judges each file by the spec family its path carries), while
    * `CALL optimize(scope => 'stray')` beds ONLY the post-evolution
    * ingest into `user_id_bucket=` dirs at O(new data) cost — the carried
    * day files re-enter the manifest BY NAME, byte-identical. At 100 TB
    * this is the operation that re-grains a table's layout without the
    * week-long rewrite a physical re-partition would cost; both layout
    * families then prune their own predicates (time windows hit the old
    * family, key lookups the new), proven in-query via lastPrune.
    */
  def q337PartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    val prevT = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_evo_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
      spark.sql("DROP TABLE IF EXISTS graft_stage.work.evo_events")
      spark.sql(
        """CREATE TABLE graft_stage.work.evo_events
          |  (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
          |  PARTITIONED BY (days(ts))""".stripMargin)
      spark.sql(
        """INSERT INTO graft_stage.work.evo_events
          |SELECT event_id, ts, user_id, value FROM events_evo_src
          |WHERE event_id % 2 = 0""".stripMargin)
      graft.sources.catalog.StagingMaintenance.optimize(
        spark, "graft_stage", "work", "evo_events", partitionBy = Some("days(ts)"))
      val dayFiles = graft.sources.catalog.StagingMaintenance
        .currentFileNames(spark, "graft_stage", "work", "evo_events")
      require(dayFiles.nonEmpty && dayFiles.forall(_.startsWith("ts_day=")),
        s"day layout incomplete: $dayFiles")
      // EVOLVE: days(ts) retires, bucket(8, user_id) becomes current
      spark.sql("CALL graft_stage.set_partition_spec('work', 'evo_events', 'bucket(8,user_id)')")
      spark.sql(
        """INSERT INTO graft_stage.work.evo_events
          |SELECT event_id, ts, user_id, value FROM events_evo_src
          |WHERE event_id % 2 = 1""".stripMargin)
      spark.sql("CALL graft_stage.optimize('work', 'evo_events', " +
        "partition_by => 'bucket(8,user_id)', scope => 'stray')")
      val files = graft.sources.catalog.StagingMaintenance
        .currentFileNames(spark, "graft_stage", "work", "evo_events")
      require(dayFiles.forall(files.contains),
        "stray-only optimize rewrote carried day files")
      require(files.forall(f =>
          f.startsWith("ts_day=") || f.startsWith("user_id_bucket=")),
        s"stray files survived the incremental layout: $files")
      graft.sources.catalog.StagingMaintenance.analyze(
        spark, "graft_stage", "work", "evo_events", Seq("ts"))
      // the OLD family prunes time windows through the RETIRED spec
      val dayLo = spark.sql(
        "SELECT date_trunc('DAY', min(ts)) FROM graft_stage.work.evo_events")
        .collect()(0).getTimestamp(0)
      graft.sources.catalog.ZoneMapScan.lastPrune = None
      val nDay = spark.sql(
        s"""SELECT count(*) FROM graft_stage.work.evo_events
           |WHERE ts >= timestamp'$dayLo' AND ts < timestamp'$dayLo' + INTERVAL 1 DAY"""
          .stripMargin).collect()(0).getLong(0)
      val pruneDay = graft.sources.catalog.ZoneMapScan.lastPrune
      require(nDay > 0 && pruneDay.exists { case (k, t) => k < t },
        s"retired days spec pruned nothing: rows=$nDay prune=$pruneDay")
      // the NEW family prunes key lookups through the CURRENT spec
      val probeU = spark.sql("SELECT max(user_id) FROM graft_stage.work.evo_events")
        .collect()(0).getLong(0) / 2L
      graft.sources.catalog.ZoneMapScan.lastPrune = None
      spark.sql(
        s"SELECT count(*) FROM graft_stage.work.evo_events WHERE user_id = $probeU")
        .collect()
      val pruneBkt = graft.sources.catalog.ZoneMapScan.lastPrune
      require(pruneBkt.exists { case (k, t) => k < t },
        s"current bucket spec pruned nothing: $pruneBkt")
      spark.sql(
        """SELECT event_id % 11 AS g, count(*) AS n,
          |  min(event_id) AS min_ev, max(event_id) AS max_ev,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM graft_stage.work.evo_events
          |GROUP BY event_id % 11 ORDER BY g""".stripMargin)
    } finally prevT match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Both ingest slices recomputed from raw events — evolution and the
    * incremental layout must lose and duplicate nothing.
    */
  val q337Oracle: String =
    s"""SELECT event_id % 11 AS g, count(*) AS n,
       |  min(event_id) AS min_ev, max(event_id) AS max_ev,
       |  ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q339

  /** METADATA TABLE FACES (r11 — Iceberg metadata tables as queryable
    * relations): `t.files`, `t.partitions`, `t.snapshots` expose the
    * table's own manifests to plain SQL, so the questions a 100 TB
    * operator actually asks — how many files, how skewed, which commits,
    * did the layout complete — are SELECTs, not bespoke tooling. The
    * query drives a small-files lifecycle and PINS the operational audit
    * in-query (file names/sizes/timestamps are environment-dependent, so
    * the oracle can't see them; the final SELECT is plain data):
    *
    *   - three small commits → `.snapshots` shows 3 commit versions and
    *     `.files` shows the accreted small files (the pile-up the faces
    *     exist to detect),
    *   - OPTIMIZE into a bucket(4,k) layout → `.snapshots` gains an
    *     optimize version, `.files` shrinks to one file per bucket dir,
    *     `.partitions` shows exactly the 4 balanced buckets,
    *   - the faces AGREE: partitions' n_files/size_bytes roll up from
    *     files, snapshot n_files matches the files face.
    */
  def q339MetadataTables(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_meta_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.meta_o")
    spark.sql(
      """CREATE TABLE graft_stage.work.meta_o AS
        |SELECT o_orderkey AS k, o_custkey AS v FROM orders_meta_src
        |WHERE o_orderkey % 3 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.meta_o
        |SELECT o_orderkey, o_custkey FROM orders_meta_src WHERE o_orderkey % 3 = 1""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.meta_o
        |SELECT o_orderkey, o_custkey FROM orders_meta_src WHERE o_orderkey % 3 = 2""".stripMargin)
    val snaps0 = spark.sql(
      "SELECT version, kind FROM graft_stage.work.meta_o.snapshots ORDER BY version").collect()
    require(snaps0.length == 3 && snaps0.forall(_.getString(1) == "commit"),
      s"snapshots face after 3 ingests: ${snaps0.mkString(",")}")
    val nSmall = spark.sql("SELECT count(*) FROM graft_stage.work.meta_o.files")
      .collect()(0).getLong(0)
    require(nSmall >= 3, s"expected accreted small files, files face shows $nSmall")
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "meta_o", partitionBy = Some("bucket(4,k)"))
    // the faces agree with each other and with the layout
    val audit = spark.sql(
      """SELECT p.partition, p.n_files, p.size_bytes, f.nf, f.sz
        |FROM graft_stage.work.meta_o.partitions p
        |JOIN (SELECT partition, count(*) AS nf, sum(size_bytes) AS sz
        |      FROM graft_stage.work.meta_o.files GROUP BY partition) f
        |ON p.partition <=> f.partition ORDER BY p.partition""".stripMargin).collect()
    require(audit.length == 4 &&
        audit.forall(r => r.getString(0).startsWith("k_bucket=") &&
          r.getInt(1) == r.getLong(3).toInt && r.getLong(2) == r.getLong(4) &&
          r.getLong(2) > 0L),
      s"partitions/files faces disagree: ${audit.mkString(",")}")
    val headSnap = spark.sql(
      """SELECT kind, n_files FROM graft_stage.work.meta_o.snapshots
        |ORDER BY version DESC LIMIT 1""".stripMargin).collect()(0)
    require(headSnap.getString(0) == "optimize" && headSnap.getInt(1) == 4,
      s"snapshots face missed the optimize: $headSnap")
    spark.sql(
      """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(v) AS BIGINT) AS sum_v
        |FROM graft_stage.work.meta_o GROUP BY k % 7 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q340

  /** STORAGE-PARTITIONED AGGREGATION over an IDENTITY layout (r11 — the
    * SPJ machinery generalized from bucket to integral identity
    * transforms): a table laid out `PARTITIONED BY (g)` reports
    * `KeyGroupedPartitioning(identity(g))` with the column VALUES as
    * partition keys parsed from the `g=<v>/` dirs, so a `GROUP BY g`
    * plans with ZERO Exchange — Spark trusts the storage clustering
    * instead of re-shuffling it. At 100 TB this is the daily-rollup shape:
    * a partition-aligned aggregation over an identity-partitioned fact
    * table is embarrassingly parallel, zero data movement. A NULL
    * derivation or any stray file withdraws the report (CatalogSpec
    * proves the fallback); the in-query require pins the exchange-free
    * executed plan.
    */
  def q340SpjIdentityAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    // session opt-in scoped to this query (restored below) — leaking it
    // could change later bench queries' plans
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_spji_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.spj_ident")
    spark.sql(
      """CREATE TABLE graft_stage.work.spj_ident (g BIGINT, event_id BIGINT, value DOUBLE)
        |PARTITIONED BY (g)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.spj_ident
        |SELECT user_id % 8, event_id, value FROM events_spji_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "spj_ident", partitionBy = Some("g"))
    val aggSql =
      """SELECT g, count(*) AS n, min(event_id) AS min_ev, max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.spj_ident GROUP BY g ORDER BY g""".stripMargin
    try {
      // the aggregation subtree must be exchange-free; only the tiny final
      // ORDER BY may range-partition its 8 rows
      val bare = spark.sql(
        """SELECT g, count(*) AS n FROM graft_stage.work.spj_ident GROUP BY g""")
      val plan = bare.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"identity-partition-aligned aggregation planned a shuffle:\n$plan")
      require(bare.count() == 8, "expected 8 identity groups")
      // materialize under the SPJ session so the returned frame's lineage
      // is conf-independent
      spark.sql(aggSql).localCheckpoint(eager = true)
    } finally oldBucketing match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  // ---------------------------------------------------------------- q341

  /** COMMIT-TIME ZONE-MAP MAINTENANCE (r11): a table declared
    * `'graft.auto-analyze'='event_id'` extends its stats sidecar AT EVERY
    * COMMIT (incremental footer harvest — only the commit's own files pay
    * a driver-side footer read, no Spark jobs, no data pages), so range
    * pruning and the metadata-only ranged DELETE work from the FIRST
    * query with no manual ANALYZE step. At 100 TB this closes the
    * freshness gap every ingest pipeline otherwise schedules around:
    * stats are a property of the commit, not of a nightly job. The
    * in-query requires pin a pruned point-lookup and a zero-rewrite
    * ranged DELETE with no ANALYZE call anywhere in the query.
    */
  def q341AutoAnalyze(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events_aa_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.ev_aa")
    spark.sql(
      """CREATE TABLE graft_stage.work.ev_aa (event_id BIGINT, user_id BIGINT, value DOUBLE)
        |TBLPROPERTIES ('graft.auto-analyze'='event_id')""".stripMargin)
    // four range-disjoint ingest commits (the arriving-in-time-order shape
    // of a real event feed) — each commit's files are bounded on event_id,
    // so the commit-time stats can actually separate them
    val m = graft.sources.Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.max(col("event_id"))).collect()(0).getLong(0)
    Seq((0L, m / 4), (m / 4, m / 2), (m / 2, 3 * m / 4), (3 * m / 4, m + 1)).foreach {
      case (lo, hiEx) => spark.sql(
        s"""INSERT INTO graft_stage.work.ev_aa
           |SELECT event_id, user_id, value FROM events_aa_src
           |WHERE event_id >= $lo AND event_id < $hiEx""".stripMargin)
    }
    // point lookup prunes with NO manual ANALYZE anywhere in this query
    val probe = spark.sql("SELECT max(event_id) FROM graft_stage.work.ev_aa")
      .collect()(0).getLong(0) / 2L
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    spark.sql(s"SELECT count(*) FROM graft_stage.work.ev_aa WHERE event_id = $probe").collect()
    val prune = graft.sources.catalog.ZoneMapScan.lastPrune
    require(prune.exists { case (k, t) => k < t },
      s"commit-time stats pruned nothing: $prune")
    // metadata-only ranged DELETE off the same commit-time stats: the top
    // slice's whole files drop by manifest edit (the cut aligns with the
    // fourth ingest's lower bound, so its files provably all-match)
    graft.sources.catalog.ZoneMapScan.lastDeleteSplit = None
    spark.sql(s"DELETE FROM graft_stage.work.ev_aa WHERE event_id >= ${3 * m / 4}")
    val split = graft.sources.catalog.ZoneMapScan.lastDeleteSplit
    require(split.exists { case (_, drop, _) => drop >= 1 },
      s"ranged delete dropped no file metadata-only: $split")
    spark.sql(
      """SELECT event_id % 9 AS g, count(*) AS n, min(event_id) AS min_ev,
        |  max(event_id) AS max_ev,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_stage.work.ev_aa GROUP BY event_id % 9 ORDER BY g""".stripMargin)
  }

  /** The surviving corpus recomputed from raw events (all four slices
    * minus the top-slice ranged delete).
    */
  val q341Oracle: String =
    s"""SELECT event_id % 9 AS g, count(*) AS n, min(event_id) AS min_ev,
       |  max(event_id) AS max_ev, ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events
       |WHERE event_id < (SELECT 3 * max(event_id) // 4 FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The rollup recomputed from raw events. */
  val q340Oracle: String =
    s"""SELECT user_id % 8 AS g, count(*) AS n, min(event_id) AS min_ev,
       |  max(event_id) AS max_ev, ${graft.operators.Det.dsumSql("value")} AS total
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** The three ingest slices recomputed from raw orders. */
  val q339Oracle: String =
    """SELECT o_orderkey % 7 AS g, count(*) AS n, min(o_orderkey) AS min_k,
      |  max(o_orderkey) AS max_k, CAST(sum(o_custkey) AS BIGINT) AS sum_v
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The surviving corpus recomputed from raw orders: both ingested slices,
    * minus the ranged delete, with the %11=3 band's values flipped by the
    * group-based UPDATE.
    */
  val q335Oracle: String =
    """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM (SELECT o_orderkey AS k,
      |        CASE WHEN o_orderkey % 11 = 3 THEN -(o_custkey + 1)
      |             ELSE o_custkey END AS v
      |      FROM orders WHERE o_orderkey % 3 <= 1)
      |WHERE k >= 500
      |GROUP BY k % 7 ORDER BY g""".stripMargin

  /** The three-way union recomputed from raw orders: the %4=1 slice with
    * %8=1 keys corrected, the branch's %4=2 slice, and main's post-fork
    * %4=3 slice — rebase must preserve all three.
    */
  val q334Oracle: String =
    """SELECT k % 5 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 8 = 1 THEN -(o_custkey + 1) ELSE o_custkey END AS v
      |  FROM orders WHERE o_orderkey % 4 = 1
      |  UNION ALL
      |  SELECT o_orderkey AS k, o_custkey AS v
      |  FROM orders WHERE o_orderkey % 4 = 2
      |  UNION ALL
      |  SELECT o_orderkey AS k, o_custkey AS v
      |  FROM orders WHERE o_orderkey % 4 = 3)
      |GROUP BY k % 5 ORDER BY g""".stripMargin

  /** Dedup-then-publish recomputed from raw orders: the surviving corpus is
    * the %4=1 slice with %8=1 keys corrected to -(o_custkey+1), plus the
    * %4=2 slice untouched.
    */
  val q332Oracle: String =
    """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 8 = 1 THEN -(o_custkey + 1) ELSE o_custkey END AS v
      |  FROM orders WHERE o_orderkey % 4 = 1
      |  UNION ALL
      |  SELECT o_orderkey AS k, o_custkey AS v
      |  FROM orders WHERE o_orderkey % 4 = 2)
      |GROUP BY k % 7 ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- q343

  /** ROW LINEAGE × MERGE-ON-READ (r12 — the pairing q335 refused at v1,
    * and the one a CDC-heavy training-corpus table actually wants: stable
    * per-example ids AND O(changed rows) write amplification). A keyed MOR
    * table declared `'graft.row-lineage'='true'`:
    *
    *   - a MOR MERGE is DV-delete + fresh insert, so identity would
    *     silently re-assign unless the replacement row CARRIES its id —
    *     the operation requires the `_row_id` metadata column on
    *     SupportsDelta and the WriteDelta writers land each updated row's
    *     preserved id in the physical column
    *     ([[graft.sources.catalog.StagingDeltaWriterFactory]]); NOT-MATCHED
    *     inserts carry NULL and resolve fresh off the new file's base;
    *   - reads resolve ids through the COMBINED DV+lineage reader (filter
    *     deleted rows, then `coalesce(phys, base + row_index)`) — the DV
    *     ghost of an updated row is suppressed, its successor answers with
    *     the SAME id;
    *   - DV-delete commits move no rows, so id bases carry through
    *     delete versions as pure manifest arithmetic;
    *   - OPTIMIZE folds the DVs and materializes ids in ONE pass (DVs
    *     first — row_index survives row filtering).
    *
    * In-query requires pin the contract the oracle can't see (ids are
    * assignment-order-dependent): unique ids, the (id,key)-binding
    * checksum bit-identical across MERGE / a second delta UPDATE /
    * the fold, inserts allocated ABOVE the old watermark, and ZERO file
    * rewrites for the delta commits. The final SELECT is plain data
    * DuckDB recomputes.
    */
  def q343MorRowLineage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, countDistinct, count => fcount, sum => fsum}
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_rlm_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_rlm")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_rlm (k BIGINT NOT NULL, v BIGINT)
        |TBLPROPERTIES ('graft.row-lineage'='true',
        |               'graft.write.mode'='merge-on-read',
        |               'graft.merge-keys'='k')""".stripMargin)
    // hash-distributed layout: the delta's matched keys hit every file —
    // exactly the shape where COW would rewrite the whole set
    spark.sql(
      """INSERT INTO graft_stage.work.orders_rlm
        |SELECT /*+ REPARTITION(6, o_orderkey) */ o_orderkey, o_custkey
        |FROM orders_rlm_src WHERE o_orderkey % 4 = 0""".stripMargin)
    def lineage() = graft.sources.catalog.StagingMaintenance
      .readLineage(spark, "graft_stage", "work", "orders_rlm")
    // (id, key)-binding checksum (the q335 pin): equal counts, distinct
    // ids, and id/id·f(k) sums fix the exact id-to-row assignment. ONE
    // aggregation pass per lifecycle stage — the all-rows checksums, the
    // original-corpus (%4=0) restriction, the insert-side min id, and the
    // watermark all come out of a single scan via conditional aggregates.
    def snap(): (Long, Long, BigDecimal, BigDecimal, // all rows
        Long, BigDecimal, BigDecimal, // %4=0 restriction
        Long, Long) = { // min id of %4=1 (Long.MaxValue when none), max id
      import org.apache.spark.sql.functions.{max => fmax2, min => fmin, when => fwhen}
      val id = col("_row_id").cast("decimal(38,0)")
      val bind = id * (col("k") % 97 + 1)
      val isOrig = col("k") % 4 === 0
      val r = lineage().agg(
        fcount(col("k")), countDistinct(col("_row_id")),
        fsum(id), fsum(bind),
        fcount(fwhen(isOrig, 1)), fsum(fwhen(isOrig, id)), fsum(fwhen(isOrig, bind)),
        fmin(fwhen(col("k") % 4 === 1, col("_row_id"))),
        fmax2(col("_row_id"))).collect()(0)
      (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)),
        r.getLong(4),
        Option(r.getDecimal(5)).map(BigDecimal(_)).getOrElse(BigDecimal(0)),
        Option(r.getDecimal(6)).map(BigDecimal(_)).getOrElse(BigDecimal(0)),
        if (r.isNullAt(7)) Long.MaxValue else r.getLong(7),
        r.getLong(8))
    }
    val pre = snap()
    require(pre._1 == pre._2, s"row ids not unique: ${pre._1} rows, ${pre._2} ids")
    val watermark = pre._9
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rlm").toSet
    val hi = spark.sql("SELECT max(o_orderkey) FROM orders_rlm_src")
      .collect()(0).getLong(0) / 2L
    // MOR MERGE: matched keys get new values (ids MUST survive the
    // DV-delete + insert), unmatched %4=1 keys insert fresh
    spark.sql(
      s"""MERGE INTO graft_stage.work.orders_rlm t
         |USING (SELECT o_orderkey AS k, o_custkey AS v FROM orders_rlm_src
         |       WHERE o_orderkey <= $hi AND o_orderkey % 4 IN (0, 1)) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v + 1000000
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_rlm").toSet
    require(before.subsetOf(after),
      s"MOR merge rewrote ${(before -- after).size} files — DV regression")
    require(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "orders_rlm").nonEmpty,
      "MOR merge committed no deletion vector")
    // the ORIGINAL corpus (%4=0 keys) keeps its exact (id,key) binding —
    // matched rows were DV-deleted and re-inserted, yet answer with the
    // same ids; every row (inserts included) still has a unique id; and
    // the MERGE inserts allocated ABOVE the pre-merge watermark
    val m = snap()
    require(m._5 == pre._1 && m._6 == pre._3 && m._7 == pre._4,
      s"MOR MERGE re-identified matched rows: $pre -> $m")
    require(m._1 == m._2, "insert ids collide with existing ids")
    require(m._8 > watermark,
      s"a MERGE insert reused an old id range: ${m._8} <= $watermark")
    // second delta UPDATE over the merged state, then the OPTIMIZE fold —
    // ONE post-fold snap pins identity across BOTH (r13 bench trim: the
    // checksum vector is invariant under each stage, so the composition
    // proof is equivalent; the stage-ISOLATED second-UPDATE pin lives in
    // CatalogSpec's "repeated delta on already-updated keys" assertion)
    spark.sql("UPDATE graft_stage.work.orders_rlm SET v = v + 7 WHERE k % 13 = 5")
    graft.sources.catalog.StagingMaintenance.optimize(spark,
      "graft_stage", "work", "orders_rlm", targetFiles = 3)
    require(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "graft_stage", "work", "orders_rlm").isEmpty,
      "OPTIMIZE did not fold the deletion vectors")
    val afterOpt = snap()
    require(afterOpt == m,
      s"second delta UPDATE + OPTIMIZE fold re-identified rows: $m -> $afterOpt")
    spark.sql(
      """SELECT k % 9 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(v) AS BIGINT) AS sum_v
        |FROM graft_stage.work.orders_rlm
        |GROUP BY k % 9 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q344

  /** SPJ with COMPATIBLE BUCKET COUNTS (r12 — SPARK-47094 parity): a
    * `bucket(8,k)` fact joins a `bucket(4,k)` fact with ZERO Exchange.
    * The catalog's `bucket` V2 function implements `ReducibleFunction`:
    * the finer side's residues REDUCE onto the coarser grain (sound
    * because mod composes — ((k mod 8) mod 4) = k mod 4), so Spark's
    * key-grouped machinery coarsens the 8-bucket groups to 4 and zips.
    * At 100 TB this removes the re-bucket-one-table tax when two
    * pipelines chose different bucket counts for the same key — the join
    * needs NEITHER side rewritten NOR shuffled. The in-query require pins
    * the exchange-free executed plan under disabled broadcast; the
    * returned rollup is plain data DuckDB recomputes.
    */
  def q344SpjCompatBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    val confKeys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = confKeys.map(kk => kk -> spark.conf.getOption(kk))
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_cb_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cb8")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.cb4")
    spark.sql(
      """CREATE TABLE graft_stage.work.cb8 (k BIGINT, cust BIGINT)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(
      "INSERT INTO graft_stage.work.cb8 SELECT o_orderkey, o_custkey FROM orders_cb_src")
    spark.sql(
      """CREATE TABLE graft_stage.work.cb4 (k BIGINT, price_cents BIGINT)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.cb4
        |SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
        |FROM orders_cb_src WHERE o_orderkey % 2 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "cb8", partitionBy = Some("bucket(8,k)"))
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "cb4", partitionBy = Some("bucket(4,k)"))
    confKeys.take(3).foreach(spark.conf.set(_, "true"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        """SELECT a.k, a.cust, b.price_cents
          |FROM graft_stage.work.cb8 a JOIN graft_stage.work.cb4 b ON a.k = b.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"bucket(8)⋈bucket(4) planned a shuffle despite compatible transforms:\n$plan")
      val n = j.agg(fsum(col("cust") * (col("k") % 97))).collect()(0).getLong(0)
      require(n != 0, "compatible-bucket SPJ checksum empty")
      spark.sql(
        """SELECT a.k % 9 AS g, count(*) AS n, CAST(sum(a.cust) AS BIGINT) AS sum_cust,
          |  CAST(sum(b.price_cents) AS BIGINT) AS sum_cents
          |FROM graft_stage.work.cb8 a JOIN graft_stage.work.cb4 b ON a.k = b.k
          |GROUP BY a.k % 9 ORDER BY g""".stripMargin).localCheckpoint(eager = true)
    } finally saved.foreach {
      case (kk, Some(v)) => spark.conf.set(kk, v)
      case (kk, None)    => spark.conf.unset(kk)
    }
  }

  /** Same shape as q336's oracle — by design: the compatible-count join
    * must produce exactly what the equal-count join produces.
    */
  val q344Oracle: String = q336Oracle

  // ---------------------------------------------------------------- q345

  /** STRING IDENTITY SPJ (r12): a corpus laid out `PARTITIONED BY (lang)`
    * — the most common identity layout of a multilingual 100 TB training
    * corpus — aggregates per-language with ZERO Exchange. The scan parses
    * each file's `lang=<v>/` directory back through Spark's own Hive path
    * escaping (`ExternalCatalogUtils.unescapePathName` — the exact inverse
    * of what the layout writer produced), so values with `=`/`:`/`/`
    * round-trip exactly; the NULL-derivation dir withdraws the report.
    * The in-query require pins the exchange-free plan; the per-language
    * rollup is recomputed by DuckDB from the raw documents table.
    */
  def q345SpjStringIdentity(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    graft.sources.Tables.documents(spark, dir).createOrReplaceTempView("docs_ssp_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.docs_lang")
    spark.sql(
      """CREATE TABLE graft_stage.work.docs_lang (lang STRING, doc_id BIGINT, nchars BIGINT)
        |PARTITIONED BY (lang)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_stage.work.docs_lang
        |SELECT lang, doc_id, CAST(length(text) AS BIGINT) FROM docs_ssp_src""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "docs_lang", partitionBy = Some("lang"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = spark.sql(
        """SELECT lang, count(*) AS n, CAST(sum(nchars) AS BIGINT) AS sum_chars,
          |  min(doc_id) AS min_doc
          |FROM graft_stage.work.docs_lang GROUP BY lang""".stripMargin)
      val plan = agg.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"string-identity-grouped aggregation planned a shuffle:\n$plan")
      require(agg.count() > 0, "empty language rollup")
      spark.sql(
        """SELECT lang, count(*) AS n, CAST(sum(nchars) AS BIGINT) AS sum_chars,
          |  min(doc_id) AS min_doc
          |FROM graft_stage.work.docs_lang GROUP BY lang ORDER BY lang""".stripMargin)
        .localCheckpoint(eager = true)
    } finally oldBucketing match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  /** The per-language rollup recomputed from raw documents. */
  val q345Oracle: String =
    """SELECT lang, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS min_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q346

  /** SMALL-FILE BINPACK (r12 — `CALL optimize(scope => 'small',
    * min_size_bytes => …)`): compact ONLY the files under a size floor;
    * everything at or above it carries into the new version BY NAME,
    * byte-identical. The streaming-ingest answer at 100 TB: a
    * commit-per-micro-batch table accretes thousands of tiny files next
    * to a few well-sized compacted ones, and a full OPTIMIZE would
    * rewrite the table to fix the tail — this rewrite costs O(small
    * bytes). In-query requires pin the carried-by-name contract (the big
    * file's NAME survives the commit) and the pack count; the oracle
    * recomputes the union — binpack is layout, never content.
    */
  def q346SmallFileCompaction(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_sfc_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_sfc")
    spark.sql(
      """CREATE TABLE graft_stage.work.orders_sfc AS
        |SELECT o_orderkey AS k, o_custkey AS v
        |FROM orders_sfc_src WHERE o_orderkey % 5 = 0""".stripMargin)
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "graft_stage", "work", "orders_sfc", targetFiles = 1)
    val big = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_sfc").toSet
    // the floor sits AT the compacted file's size (files >= floor carry),
    // so the proof scales to any SF: single-row drips are always below it
    val floor = spark.sql("CALL graft_stage.detail('work', 'orders_sfc')")
      .collect()(0).getLong(2)
    // micro-batch drip: three tiny single-row commits beside the big file
    Seq(1L, 2L, 3L).foreach(i => spark.sql(
      s"INSERT INTO graft_stage.work.orders_sfc VALUES (${-i}, $i)"))
    val (packed, after, _) = {
      val r = spark.sql(
        s"""CALL graft_stage.optimize('work', 'orders_sfc', 1,
           |scope => 'small', min_size_bytes => $floor)""".stripMargin).collect()(0)
      (r.getInt(0), r.getInt(1), r.getLong(2))
    }
    require(packed == 3 && after == 1,
      s"expected 3 tiny files packed into 1, got $packed -> $after")
    val now = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_sfc").toSet
    require(big.subsetOf(now),
      "small-file optimize rewrote the compacted file — O(small bytes) contract broken")
    require(now.size == big.size + 1, s"unexpected post-binpack file set: $now")
    spark.sql(
      """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(v) AS BIGINT) AS sum_v
        |FROM graft_stage.work.orders_sfc
        |GROUP BY k % 7 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q348

  /** WHERE-SCOPED OPTIMIZE (r12 — predicate-scoped maintenance): at
    * 100 TB, "re-cluster yesterday" must rewrite yesterday's slice, never
    * the table. `CALL optimize(..., where_filter => '<pred>')` selects
    * files by zone maps + partition paths (the DELETE three-way split's
    * can-match test); everything the predicate cannot touch carries BY
    * NAME, byte-identical. The query builds a three-commit ranged table
    * (auto-analyzed, so the rewrite's own output stays prunable),
    * re-clusters ONLY the middle key range, and pins in-query that
    * exactly the mid-range file rewrote and both out-of-range files
    * carried. Layout only — the oracle recomputes the union.
    */
  def q348WhereScopedOptimize(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_wsc_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_wsc")
    spark.sql("""CREATE TABLE graft_stage.work.orders_wsc (k BIGINT, v BIGINT)
      TBLPROPERTIES ('graft.auto-analyze'='k')""")
    val m = spark.sql("SELECT max(o_orderkey) FROM orders_wsc_src")
      .collect()(0).getLong(0)
    Seq((0L, m / 3), (m / 3, 2 * m / 3), (2 * m / 3, m + 1)).foreach { case (lo, hiEx) =>
      spark.sql(
        s"""INSERT INTO graft_stage.work.orders_wsc
           |SELECT /*+ COALESCE(1) */ o_orderkey, o_custkey FROM orders_wsc_src
           |WHERE o_orderkey >= $lo AND o_orderkey < $hiEx""".stripMargin)
    }
    val before = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_wsc").toSet
    val r = spark.sql(
      s"""CALL graft_stage.optimize('work', 'orders_wsc', 1, cluster_by => 'k',
         |where_filter => 'k >= ${m / 3 + 1} AND k < ${2 * m / 3 - 1}')""".stripMargin).collect()(0)
    require(r.getInt(0) == 1,
      s"expected exactly the mid-range file selected, got ${r.getInt(0)}")
    val after = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "graft_stage", "work", "orders_wsc").toSet
    require((before & after).size == 2,
      "out-of-range files did not carry by name — where-scope rewrote the table")
    spark.sql(
      """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(v) AS BIGINT) AS sum_v
        |FROM graft_stage.work.orders_wsc
        |GROUP BY k % 7 ORDER BY g""".stripMargin)
  }

  // ---------------------------------------------------------------- q349

  /** BATCH CHANGE-FEED FACE (r12 — Delta's `table_changes` as plain SQL):
    * `SELECT … FROM cat.ns.t.changes WHERE _commit_version …` serves the
    * exact per-version row deltas the streaming face emits — the CDC
    * BACKFILL surface (a new consumer bootstraps with one batch SQL read,
    * then tails the stream from where it left off). `_commit_version`
    * comparisons push down to VERSION pruning: an out-of-range version's
    * diff is never computed or read — pinned in-query by requiring the
    * pruned version's CDF materialization directory to be ABSENT after
    * the bounded read. The lifecycle drives insert → keyless
    * content-paired UPDATE images → bare deletes; the oracle recomputes
    * every feed row from raw orders.
    */
  def q349BatchChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders_bcf_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work")
    spark.sql("DROP TABLE IF EXISTS graft_stage.work.orders_bcf")
    spark.sql("CREATE TABLE graft_stage.work.orders_bcf (k BIGINT, v BIGINT)")
    spark.sql(
      """INSERT INTO graft_stage.work.orders_bcf
        |SELECT o_orderkey, o_custkey FROM orders_bcf_src
        |WHERE o_orderkey % 6 = 1""".stripMargin) // v1
    spark.sql("UPDATE graft_stage.work.orders_bcf SET v = v + 100 WHERE k % 7 = 0") // v2
    spark.sql("DELETE FROM graft_stage.work.orders_bcf WHERE k % 5 = 2") // v3
    spark.sql("UPDATE graft_stage.work.orders_bcf SET v = v + 1 WHERE k % 11 = 0") // v4
    val out = spark.sql(
      """SELECT _change_type, _commit_version, count(*) AS n,
        |  min(k) AS min_k, max(k) AS max_k, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM graft_stage.work.orders_bcf.changes
        |WHERE _commit_version <= 3
        |GROUP BY _change_type, _commit_version
        |ORDER BY _commit_version, _change_type""".stripMargin)
      .localCheckpoint(eager = true)
    // version pruning is REAL: v4's diff was never materialized
    val root = new org.apache.hadoop.fs.Path(stageRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$stageRoot/work/orders_bcf/_graft_cdf/v4")),
      "_commit_version pushdown did not prune the out-of-range version")
    out
  }

  /** Every feed row recomputed from raw orders: v1 = the slice as inserts,
    * v2 = content-paired update images for the %7=0 keys, v3 = bare
    * deletes of the %5=2 keys at their then-current values.
    */
  val q349Oracle: String =
    """WITH slice AS (
      |  SELECT o_orderkey AS k, o_custkey AS v FROM orders WHERE o_orderkey % 6 = 1),
      |feed AS (
      |  SELECT k, v, 'insert' AS ct, 1 AS ver FROM slice
      |  UNION ALL
      |  SELECT k, v, 'update_preimage', 2 FROM slice WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, v + 100, 'update_postimage', 2 FROM slice WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, CASE WHEN k % 7 = 0 THEN v + 100 ELSE v END, 'delete', 3
      |  FROM slice WHERE k % 5 = 2)
      |SELECT ct AS _change_type, CAST(ver AS BIGINT) AS _commit_version,
      |  count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM feed GROUP BY ct, ver ORDER BY _commit_version, _change_type""".stripMargin

  /** The full corpus recomputed from raw orders — where-scope is layout,
    * never content.
    */
  val q348Oracle: String =
    """SELECT o_orderkey % 7 AS g, count(*) AS n, min(o_orderkey) AS min_k,
      |  max(o_orderkey) AS max_k, CAST(sum(o_custkey) AS BIGINT) AS sum_v
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The slice plus the three drip rows, recomputed from raw orders. */
  val q346Oracle: String =
    """SELECT k % 7 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM (
      |  SELECT o_orderkey AS k, o_custkey AS v
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL SELECT -1, 1 UNION ALL SELECT -2, 2 UNION ALL SELECT -3, 3)
      |GROUP BY k % 7 ORDER BY g""".stripMargin

  /** The merged-then-patched corpus recomputed from raw orders: the %4=0
    * base with low-half values bumped by the MERGE, the low-half %4=1
    * inserts, and the %13=5 keys bumped again by the second UPDATE.
    */
  val q343Oracle: String =
    """SELECT k % 9 AS g, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(v) AS BIGINT) AS sum_v
      |FROM (
      |  SELECT k, CASE WHEN k % 13 = 5 THEN v + 7 ELSE v END AS v
      |  FROM (
      |    SELECT o_orderkey AS k,
      |      CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
      |           THEN o_custkey + 1000000 ELSE o_custkey END AS v
      |    FROM orders WHERE o_orderkey % 4 = 0
      |    UNION ALL
      |    SELECT o_orderkey AS k, o_custkey AS v
      |    FROM orders
      |    WHERE o_orderkey % 4 = 1
      |      AND o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)))
      |GROUP BY k % 9 ORDER BY g""".stripMargin
}
