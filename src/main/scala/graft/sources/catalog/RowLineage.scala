package graft.sources.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, element_at, split}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** ROW LINEAGE for staging-catalog tables (the Iceberg-v3 "row lineage" /
  * Delta "row tracking" surface, re-derived for a field-ID-free parquet
  * store): every row carries a table-unique, stable `_row_id` that survives
  * compaction and copy-on-write deletes — the identity an incremental
  * consumer needs to recognize "the same row" across layout changes, and
  * the provenance key a 100 TB training-data pipeline wants on every
  * example (which shard produced it, which dedup round dropped it).
  *
  * Design — ids are VIRTUAL until a rewrite MATERIALIZES them:
  *
  *  - Every version manifest of a lineage table carries a `rowIds` vector
  *    (one `file|base|kind` entry per current file) and a `nextRowId`
  *    watermark. A commit assigns each ADDED file a fresh base
  *    (`next + i·2^32`) and bumps the watermark; carried files keep their
  *    entries verbatim — assignment is pure manifest arithmetic, zero data
  *    I/O, and the create-exclusive commit makes it atomic under races.
  *  - A VIRTUAL file's row ids are `base + row_index` (Spark's parquet
  *    readers produce `_metadata.row_index` correctly even under row-group
  *    skipping). Immutable files make this stable for free.
  *  - A REWRITE that must preserve identity (OPTIMIZE compaction, the
  *    copy-on-write DELETE remainder) reads rows WITH their resolved ids
  *    and writes them into a physical `_graft_row_id` column; the manifest
  *    marks those files materialized (`|m`). Reads resolve
  *    `coalesce(physical, base + row_index)` — a materialized file's
  *    NULL-physical rows (none today; MERGE-inserted rows if a future
  *    writer mixes them in) still get stable fresh ids from the file's own
  *    base. Normal reads project the physical column off (explicit read
  *    schemas; parquet matches by name), so lineage costs nothing when not
  *    asked for.
  *  - Group-based rewrites (UPDATE, MERGE, and DELETEs whose predicate the
  *    V1 metadata path cannot translate — e.g. `k % 10 = 3`) flow through
  *    Spark's replacement write (declared schema only), so their REWRITTEN
  *    files re-identify:
  *    fresh virtual bases, documented semantics (file-granular zone-map
  *    pruning keeps the re-identified set minimal — carried files never
  *    lose identity). Time travel reads version N with version N's
  *    `rowIds`, so pinned snapshots see pinned identities.
  *
  * Declared at CREATE with `'graft.row-lineage'='true'` (a marker sidecar;
  * the property is a contract on every future commit, not a backfill).
  * v1 boundaries, enforced loudly: not combinable with merge-on-read
  * tables, and WAP branches are refused (a branch and main assigning from
  * the same watermark would collide at publish; branch-aware allocation is
  * a follow-up).
  */
object RowLineage {

  /** Marker sidecar: present ⇔ the table tracks row lineage. */
  val Marker = "_graft_rowlineage"

  /** Physical column name in materialized files. Underscore-prefixed so it
    * can never collide with a declared column (the catalog's data columns
    * come from SQL identifiers; the declared schema never contains it).
    */
  val PhysCol = "_graft_row_id"

  /** Id range reserved per file: row_index < 2^32 for any real parquet
    * file, and 2^63 / 2^32 = 2^31 file-slots of lifetime headroom.
    */
  val Stride: Long = 1L << 32

  def enabled(fs: FileSystem, d: Path): Boolean =
    GraftStagingCatalog.isFile(fs, new Path(d, Marker))

  def writeMarker(fs: FileSystem, d: Path): Unit =
    GraftStagingCatalog.writeString(fs, new Path(d, Marker), "1")

  /** One current file's lineage: id base + whether a physical column holds
    * the authoritative ids.
    */
  final case class Entry(base: Long, mat: Boolean)

  /** Parse a manifest's `rowIds` vector + `nextRowId` watermark. Absent
    * fields read as empty/0 — every pre-lineage manifest.
    */
  def parse(txt: String): (Map[String, Entry], Long) = {
    val next = "\"nextRowId\":(\\d+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(0L)
    val m = GraftStagingCatalog.parseArray(txt, "rowIds").flatMap { e =>
      // rsplit twice: file names never contain '|' (part-file names +
      // `k=v/` partition dirs), but guard the parse against one anyway
      val i2 = e.lastIndexOf('|'); val i1 = e.lastIndexOf('|', i2 - 1)
      if (i1 < 0) None
      else Some(e.substring(0, i1) ->
        Entry(e.substring(i1 + 1, i2).toLong, e.substring(i2 + 1) == "m"))
    }.toMap
    (m, next)
  }

  private def render(map: Map[String, Entry]): Seq[String] =
    map.toSeq.sortBy(_._1).map { case (f, e) =>
      s"$f|${e.base}|${if (e.mat) "m" else "v"}" }

  /** Assign the `rowIds` vector for a new version's full file set:
    * carried files keep their entries from `prevMapTxt`'s manifest, new
    * files get fresh bases off `nextFromTxt`'s watermark (normally the same
    * manifest; RESTORE maps from the restore target but must keep the
    * watermark monotonic off the LATEST manifest). `mat` names the new
    * files written with the physical column. Returns (rendered entries,
    * new watermark).
    */
  def assign(prevMapTxt: Option[String], nextFromTxt: Option[String],
      files: Seq[String], mat: Set[String]): (Seq[String], Long) = {
    val (prev, _) = parse(prevMapTxt.getOrElse(""))
    val next0 = parse(nextFromTxt.getOrElse(""))._2
    val fresh = files.filterNot(prev.contains).sorted.zipWithIndex.toMap
    val entries = files.map { f =>
      f -> prev.getOrElse(f,
        Entry(next0 + fresh(f) * Stride, mat.contains(f)))
    }.toMap
    (render(entries), next0 + fresh.size * Stride)
  }

  /** The read schema a lineage-aware rewrite uses: the declared schema plus
    * the (nullable — virtual files lack it) physical id column.
    */
  def readSchema(declared: StructType): StructType =
    StructType(declared.fields :+ StructField(PhysCol, LongType, nullable = true))

  /** Resolve final row ids over a files-read that used [[readSchema]] and
    * carries `_metadata`: `coalesce(physical, base(file) + row_index)`.
    * Joins a broadcast (file name → base, mat) vector — the same shape the
    * position-DV read path broadcasts; file NAMES are unique (uuid-token
    * part names), so matching on the path's last component is exact even
    * under `k=v/` partition layouts.
    */
  def resolveIds(df: DataFrame, entries: Map[String, Entry],
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ent = entries.toSeq.map { case (f, e) =>
      (f.substring(f.lastIndexOf('/') + 1), e.base) }
      .toDF("__gl_file", "__gl_base")
    val named = df
      .withColumn("__gl_name", element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__gl_idx", col("_metadata.row_index"))
    val resolved = named
      .join(broadcast(ent), named("__gl_name") === ent("__gl_file"), "left")
      .withColumn(idCol,
        coalesce(col(PhysCol), col("__gl_base") + col("__gl_idx")))
      .drop("__gl_name", "__gl_idx", "__gl_file", "__gl_base")
    // materializing call sites resolve INTO the physical column itself
    if (idCol == PhysCol) resolved else resolved.drop(PhysCol)
  }

  /** Read `files` of a lineage table with the declared columns plus a
    * resolved `idCol` (the physical column when materialized, else
    * `base + row_index`). The building block for [[StagingMaintenance
    * .readLineage]], OPTIMIZE's preserving rewrite, and the COW DELETE
    * remainder.
    */
  def readWithIds(spark: SparkSession, d: Path, files: Seq[String],
      declared: StructType, entries: Map[String, Entry],
      idCol: String = "_row_id"): DataFrame = {
    if (files.isEmpty) {
      val schema = StructType(declared.fields :+
        StructField(idCol, LongType, nullable = true))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val raw = spark.read.schema(readSchema(declared))
      .parquet(files.map(f => new Path(d, f).toString): _*)
      .select(col("*"), col("_metadata"))
    resolveIds(raw, entries, idCol).drop("_metadata")
  }

  /** A rewrite's materializing projection: same resolution, but the id
    * lands IN the physical column so the written files carry it.
    */
  def materialize(df: DataFrame, entries: Map[String, Entry]): DataFrame =
    resolveIds(df, entries, PhysCol)

  /** Lineage-aware predicate column referencing a resolved id (helper for
    * call sites that filter after materializing).
    */
  def physCol: Column = col(PhysCol)
}
