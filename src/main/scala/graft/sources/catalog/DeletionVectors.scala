package graft.sources.catalog

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField,
  StructType}

/** Equality-delete DELETION VECTORS — the merge-on-read (MOR) write path for
  * staging-catalog tables whose row-level churn is keyed but NOT clustered
  * (the high-churn CDC shape: matched keys spread across every file, so the
  * copy-on-write path rewrites the whole touched set per batch — write
  * amplification proportional to touched-file BYTES, not changed rows).
  *
  * Model (the Iceberg equality-delete idea, file-scoped):
  *
  *  - A DV sidecar (`_graft_dv/dv-<token>.json`) records a KEY COLUMN, a
  *    set of deleted key values, and the exact data files it applies to —
  *    the files the row-level operation's scan planned, i.e. every file
  *    that may still hold a stale row for those keys. Files written BY the
  *    same operation (the new row versions) are never named, so the fresh
  *    rows survive.
  *  - The version manifest gains a `dvs` array naming the active sidecars;
  *    a MOR commit ADDS files and DVs and rewrites NOTHING — the manifest
  *    is previous-files ++ fresh, dvs ++ one.
  *  - The READ path applies DVs inside the DSv2 scan: partitions holding a
  *    DV'd file are planned one-file-per-partition, and their readers drop
  *    rows whose key is in that file's delete set. Plain `SELECT`, time
  *    travel, and the row-level operation's own scan (so a second MERGE
  *    never re-matches ghost rows) all read through this.
  *  - OPTIMIZE folds: it reads with DVs applied and commits `dvs = []`.
  *
  * Contract: the declared merge key (`graft.merge-keys` table property at
  * CREATE) must be a ROW IDENTIFIER — unique per row, the CDC primary key.
  * Equality deletes suppress EVERY stale row with a deleted key in the
  * scoped files; with non-unique keys a partial UPDATE could suppress
  * sibling rows (the same contract Iceberg's equality deletes carry).
  *
  * Reference tie: the reference's write surface updates each object
  * independently and never rewrites neighbors
  * (`CephRgwFileSystem.java:216-289`); DVs are that per-object write
  * economy carried up to row-level semantics.
  */
object DeletionVectors {
  val DvDir = "_graft_dv"
  val MorSidecar = "_graft_mor.txt"

  /** Sidecar marker for POSITION-delete mode: merge-on-read declared with
    * NO merge key (raw event ingest — no natural row identifier). Row-level
    * DELETEs then record `(file, row position)` sidecars instead of paying
    * a full copy-on-write rewrite; see [[writePosDv]]/[[PosDvPartition]].
    */
  val PosMarker = "#pos"

  /** The declared MOR key column, when the table was created merge-on-read
    * WITH a key ([[morPos]] is the keyless position-delete mode).
    */
  def morKey(fs: FileSystem, d: Path): Option[String] = {
    val p = new Path(d, MorSidecar)
    if (GraftStagingCatalog.isFile(fs, p))
      Some(GraftStagingCatalog.readString(fs, p).trim)
        .filter(s => s.nonEmpty && s != PosMarker)
    else None
  }

  /** Keyless merge-on-read (position-delete) mode? */
  def morPos(fs: FileSystem, d: Path): Boolean = {
    val p = new Path(d, MorSidecar)
    GraftStagingCatalog.isFile(fs, p) &&
      GraftStagingCatalog.readString(fs, p).trim == PosMarker
  }

  def writeMorKey(fs: FileSystem, d: Path, key: String): Unit =
    GraftStagingCatalog.writeString(fs, new Path(d, MorSidecar), key)

  /** Canonical in-memory key value: integral keys normalize to Long,
    * strings stay String — one representation for sidecar I/O, reader
    * filters, and maintenance joins.
    */
  def canonicalize(v: Any): Any = v match {
    case i: Int   => i.toLong
    case i: java.lang.Integer => i.longValue()
    case l: Long  => l
    case l: java.lang.Long => l.longValue()
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"deletion vectors support integral and string keys, got ${other.getClass}")
  }

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  /** Write one DV sidecar; returns its DvDir-relative name for the manifest.
    * Key values are JSON numbers (integral) or URL-encoded JSON strings.
    */
  def writeDv(fs: FileSystem, d: Path, keyCol: String, isString: Boolean,
      files: Seq[String], keys: Set[Any]): String = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val name = s"dv-$token.json"
    val dir = new Path(d, DvDir)
    fs.mkdirs(dir)
    val keyJson =
      if (isString) keys.toSeq.map(k => "\"" + enc(k.asInstanceOf[String]) + "\"").sorted
      else keys.toSeq.map(_.asInstanceOf[Long]).sorted.map(_.toString)
    val json =
      s"""{"key":"${enc(keyCol)}","type":"${if (isString) "string" else "long"}",""" +
        s""""files":[${files.sorted.map(f => "\"" + f + "\"").mkString(",")}],""" +
        s""""keys":[${keyJson.mkString(",")}]}"""
    val out = fs.create(new Path(dir, name), false) // DVs are immutable: create-exclusive
    try out.write(json.getBytes(UTF_8)) finally out.close()
    name
  }

  /** Load the named DV sidecars into a per-file deleted-key map (keys merged
    * across DVs naming the same file). Missing sidecars fail loudly — a DV
    * is commit metadata, not an advisory cache.
    */
  def loadDvs(fs: FileSystem, d: Path, names: Seq[String]): Map[String, Set[Any]] =
    if (names.isEmpty) Map.empty
    else {
      val perFile = scala.collection.mutable.Map.empty[String, Set[Any]]
      names.foreach { n =>
        val txt = GraftStagingCatalog.readString(fs, new Path(new Path(d, DvDir), n))
        if ("\"type\":\"pos\"".r.findFirstIn(txt).isDefined) {
          // position sidecar: belongs to loadPosDvs, not the key map
        } else {
        val isString = "\"type\":\"string\"".r.findFirstIn(txt).isDefined
        val files = GraftStagingCatalog.parseArray(txt, "files")
        val keysBody = ("\"keys\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
        val keys: Set[Any] =
          if (keysBody.trim.isEmpty) Set.empty
          else if (isString)
            "\"([^\"]*)\"".r.findAllMatchIn(keysBody).map(m => dec(m.group(1)): Any).toSet
          else keysBody.split(',').iterator.map(_.trim).filter(_.nonEmpty)
            .map(_.toLong: Any).toSet
        files.foreach(f => perFile(f) = perFile.getOrElse(f, Set.empty) ++ keys)
        }
      }
      perFile.toMap
    }

  /** Deleted-key map in force at `manifest` (empty when the version carries
    * no DVs — every pre-MOR table and every post-OPTIMIZE version).
    */
  def dvMapAt(fs: FileSystem, d: Path, manifest: Path): Map[String, Set[Any]] =
    loadDvs(fs, d, GraftStagingCatalog.manifestDvs(fs, manifest))

  // ---- POSITION deletes (keyless MOR — the Iceberg (file, pos) shape) ----

  /** Write one POSITION-delete sidecar: per file, the ordinals of deleted
    * rows — row position = the row's index in an UNFILTERED sequential read
    * of the file (what `_metadata.row_index` reports and what the scan-side
    * counter reproduces). Returns the DvDir-relative name.
    */
  def writePosDv(fs: FileSystem, d: Path, perFile: Map[String, Seq[Long]]): String = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val name = s"dv-$token.json"
    val dir = new Path(d, DvDir)
    fs.mkdirs(dir)
    val body = perFile.toSeq.sortBy(_._1).map { case (f, ps) =>
      "\"" + enc(f) + "\":[" + ps.distinct.sorted.mkString(",") + "]"
    }.mkString(",")
    val json = s"""{"type":"pos","pos":{$body}}"""
    val out = fs.create(new Path(dir, name), false) // DVs are immutable
    try out.write(json.getBytes(UTF_8)) finally out.close()
    name
  }

  /** Load the named sidecars' POSITION deletes into a per-file ordinal set
    * (merged across sidecars; non-pos sidecars are skipped — one manifest
    * `dvs` array carries either kind).
    */
  def loadPosDvs(fs: FileSystem, d: Path, names: Seq[String]): Map[String, Set[Long]] =
    if (names.isEmpty) Map.empty
    else {
      val perFile = scala.collection.mutable.Map.empty[String, Set[Long]]
      names.foreach { n =>
        val txt = GraftStagingCatalog.readString(fs, new Path(new Path(d, DvDir), n))
        if ("\"type\":\"pos\"".r.findFirstIn(txt).isDefined) {
          "\"([^\"]+)\":\\[([^\\]]*)\\]".r.findAllMatchIn(txt).foreach { m =>
            val f = dec(m.group(1))
            if (f != "type" && f != "pos") {
              val ps = m.group(2).split(',').iterator.map(_.trim).filter(_.nonEmpty)
                .map(_.toLong).toSet
              perFile(f) = perFile.getOrElse(f, Set.empty) ++ ps
            }
          }
        }
      }
      perFile.toMap
    }

  /** Position-delete map in force at `manifest`. */
  def posMapAt(fs: FileSystem, d: Path, manifest: Path): Map[String, Set[Long]] =
    loadPosDvs(fs, d, GraftStagingCatalog.manifestDvs(fs, manifest))

  /** Apply a POSITION-delete map to a V1 DataFrame read of the table's
    * files (the maintenance/fold read path): rows are identified by
    * `(_metadata.file_path suffix-matched to the table-relative name,
    * _metadata.row_index)` and removed with one broadcast anti-join —
    * the same shape (and the same r9 sibling-dir guard) as the equality
    * [[applyToRead]].
    */
  def applyPosToRead(df: DataFrame, dv: Map[String, Set[Long]]): DataFrame =
    if (dv.isEmpty) df
    else {
      import org.apache.spark.sql.functions.{broadcast, col, concat, element_at, endswith,
        lit, split}
      val spark = df.sparkSession
      import spark.implicits._
      def base(f: String): String = f.substring(f.lastIndexOf('/') + 1)
      val triples = dv.toSeq.flatMap { case (f, ps) => ps.iterator.map(p => (base(f), f, p)) }
      val dvDf = triples.toDF("__gdv_f", "__gdv_rel", "__gdv_p")
      val keep = df.columns // _metadata is a hidden pseudo-column: select it explicitly
      val tagged = df.select(col("*"), col("_metadata.file_path").as("__gdv_path"),
        col("_metadata.row_index").as("__gdv_pos"))
        .withColumn("__gdv_file", element_at(split(col("__gdv_path"), "/"), -1))
      tagged.join(broadcast(dvDf),
          tagged("__gdv_file") === dvDf("__gdv_f") &&
            endswith(tagged("__gdv_path"), concat(lit("/"), dvDf("__gdv_rel"))) &&
            tagged("__gdv_pos") === dvDf("__gdv_p"), "left_anti")
        .select(keep.map(col).toIndexedSeq: _*)
    }

  /** One position-DV'd file's splits as their own partition (splits stay
    * together, sorted by offset, so the reader's sequential row counter IS
    * the file position — valid only because position-mode scans push no
    * data filters to parquet; see ZoneMapScanBuilder.pushFilters).
    */
  final case class PosDvPartition(inner: FilePartition, deleted: Set[Long])
      extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Spark's generated row-index column under its TEMPORARY name — a read
    * schema containing this field makes every parquet reader (vectorized or
    * record-level, V1 or DSv2) emit the row's TRUE file ordinal in it,
    * row-group skipping included; it is the column `_metadata.row_index`
    * itself materializes through.
    */
  val RowIdxField: StructField = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    // NULLABLE: the column does not exist in the data files (the readers
    // GENERATE it), and the parquet readers reject a missing non-nullable
    // column before the row-index special case gets a look — generation is
    // keyed on the name alone (ParquetRowIndexUtil.isRowIndexColumn)
    ParquetFileFormat.ROW_INDEX_FIELD.copy(
      name = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, nullable = true)
  }

  /** Position-delete scan info for the ROW-INDEX read path (the plain-scan
    * mode that KEEPS parquet predicate pushdown): the delegate's read schema
    * was widened with Spark's `_tmp_metadata_row_index` generated column —
    * the parquet readers populate it with TRUE file ordinals, row-group
    * skipping included (the same machinery `_metadata.row_index` rides), so
    * pushed predicates can skip row groups without desyncing positions.
    * Readers drop rows whose (file, ordinal) is deleted and project the
    * generated column back off; `idxOrdinal` is resolved from the BUILT
    * scan's schema (never assumed trailing — FileScanBuilder reorders to
    * table-schema order).
    */
  final case class PosIdxInfo(
      idxOrdinal: Int,
      outputSchema: StructType,
      projectOrdinals: Array[Int])

  /** Reader factory for the row-index position-delete path: partitions of
    * DV'd files ([[PosDvPartition]]) filter rows by the generated ordinal
    * column; every partition projects the generated column off. All
    * row-based (the mixed-partition rule).
    */
  final class PosIdxReaderFactory(inner: PartitionReaderFactory, info: PosIdxInfo,
      tableDir: String) extends PartitionReaderFactory {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}

    override def supportColumnarReads(partition: InputPartition): Boolean = false

    private def projected(r: PartitionReader[InternalRow]): PartitionReader[InternalRow] = {
      val cols = info.projectOrdinals.zip(info.outputSchema.fields).map { case (ord, f) =>
        (ord, f.dataType, f.nullable)
      }
      new PartitionReader[InternalRow] {
        private lazy val proj = UnsafeProjection.create(cols.toIndexedSeq.map {
          case (i, dt, n) => BoundReference(i, dt, n)
        })
        override def next(): Boolean = r.next()
        override def get(): InternalRow = proj(r.get())
        override def close(): Unit = r.close()
      }
    }

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case PosDvPartition(fp, deleted) =>
          val base = inner.createReader(fp)
          val ord = info.idxOrdinal
          projected(new PartitionReader[InternalRow] {
            private var current: InternalRow = _
            override def next(): Boolean = {
              while (base.next()) {
                val row = base.get()
                graft.sources.catalog.ZoneMapScan.bumpPosRows(tableDir)
                if (!deleted.contains(row.getLong(ord))) { current = row; return true }
              }
              false
            }
            override def get(): InternalRow = current
            override def close(): Unit = base.close()
          })
        case other => projected(inner.createReader(other))
      }
  }

  /** Repack pruned partitions for POSITION-delete application — the
    * position twin of [[repack]].
    */
  def repackPos(parts: Array[InputPartition], dv: Map[String, Set[Long]],
      statKey: org.apache.hadoop.fs.Path => String): Array[InputPartition] = {
    val out = Array.newBuilder[InputPartition]
    val affected = scala.collection.mutable.LinkedHashMap
      .empty[String, (Set[Long], scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.datasources.PartitionedFile])]
    var idx = 0
    parts.foreach {
      case fp: FilePartition =>
        val (hit, clean) = fp.files.partition(pf => dv.contains(statKey(pf.toPath)))
        if (clean.nonEmpty) { out += FilePartition(idx, clean); idx += 1 }
        hit.foreach { pf =>
          val k = statKey(pf.toPath)
          affected.getOrElseUpdate(k,
            (dv(k), scala.collection.mutable.ArrayBuffer.empty))._2 += pf
        }
      case other => out += other
    }
    affected.valuesIterator.foreach { case (positions, pfs) =>
      out += PosDvPartition(FilePartition(idx, pfs.sortBy(_.start).toArray), positions)
      idx += 1
    }
    out.result()
  }

  /** Reader factory applying POSITION deletes: a sequential row counter per
    * partition (= per file, by [[repackPos]]'s packing) skips the deleted
    * ordinals. Everything reads row-based while position DVs are active —
    * the same mixed-partition rule as the equality factory — and
    * non-position partitions pass through to the delegate.
    */
  final class PosDvReaderFactory(inner: PartitionReaderFactory)
      extends PartitionReaderFactory {
    override def supportColumnarReads(partition: InputPartition): Boolean = false
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case PosDvPartition(fp, deleted) =>
          val base = inner.createReader(fp)
          new PartitionReader[InternalRow] {
            private var pos = -1L
            private var current: InternalRow = _
            override def next(): Boolean = {
              while (base.next()) {
                pos += 1
                if (!deleted.contains(pos)) { current = base.get(); return true }
              }
              false
            }
            override def get(): InternalRow = current
            override def close(): Unit = base.close()
          }
        case other => inner.createReader(other)
      }
  }

  /** Apply a DV map to a V1 DataFrame read of the table's files — the
    * MAINTENANCE read path (OPTIMIZE fold, rename rewrite, overwrite's
    * delete phase), where rows must not resurrect. File attribution rides
    * `input_file_name()`: the broadcast-hash join key is the BASENAME (one
    * canonical component on both sides), and an `endswith` guard on
    * `"/" + <table-relative path>` scopes the match to the exact laid-out
    * file — a basename alone is ambiguous under partition layout, where
    * one OPTIMIZE partitionBy job writes the SAME part number + job UUID
    * into every partition dir, and a DV scoped to one dir must not
    * suppress its keys in sibling-dir files (r9 advisory). The delete is
    * one broadcast anti-join on (file, key) — the shape that survives
    * 100 TB (the DV set is bounded by churn since the last OPTIMIZE, never
    * by table size).
    */
  def applyToRead(df: DataFrame, keyCol: String, dv: Map[String, Set[Any]]): DataFrame =
    if (dv.isEmpty) df
    else {
      import org.apache.spark.sql.functions.{broadcast, concat, element_at, endswith,
        input_file_name, lit, split}
      val spark = df.sparkSession
      import spark.implicits._
      def base(f: String): String = f.substring(f.lastIndexOf('/') + 1)
      val triples = dv.toSeq.flatMap { case (f, ks) => ks.iterator.map(k => (base(f), f, k)) }
      val dvDf =
        if (triples.headOption.exists(_._3.isInstanceOf[String]))
          triples.map { case (b, f, k) => (b, f, k.asInstanceOf[String]) }
            .toDF("__gdv_f", "__gdv_rel", "__gdv_k")
        else triples.map { case (b, f, k) => (b, f, k.asInstanceOf[Long]) }
          .toDF("__gdv_f", "__gdv_rel", "__gdv_k")
      val tagged = df.withColumn("__gdv_path", input_file_name())
        .withColumn("__gdv_file", element_at(split(input_file_name(), "/"), -1))
      tagged.join(broadcast(dvDf),
          tagged("__gdv_file") === dvDf("__gdv_f") &&
            endswith(tagged("__gdv_path"), concat(lit("/"), dvDf("__gdv_rel"))) &&
            tagged(keyCol) === dvDf("__gdv_k"), "left_anti")
        .drop("__gdv_file", "__gdv_path")
    }

  /** DV info threaded from the scan builder into the pruned scan: the
    * per-file deleted keys, the key column's position and type in the
    * DELEGATE's (possibly widened, table-ordered) read schema, the schema
    * this scan REPORTS to Spark, and — when the key column had to be added
    * for filtering — the delegate-row ordinals of the reported columns
    * (readers project the key back off).
    */
  final case class DvScanInfo(
      fileKeys: Map[String, Set[Any]],
      keyOrdinal: Int,
      keyType: DataType,
      outputSchema: StructType,
      projectOrdinals: Option[Array[Int]])

  /** One DV-affected file's splits, planned as their own partition so the
    * reader knows every row's file. Carries that file's deleted keys.
    */
  final case class DvPartition(inner: FilePartition, deleted: Set[Any])
      extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Repack pruned partitions for DV application: files with a DV entry
    * move into one [[DvPartition]] per FILE (splits of the same file stay
    * together); unaffected files keep the delegate's packing.
    */
  def repack(parts: Array[InputPartition], dv: Map[String, Set[Any]],
      statKey: org.apache.hadoop.fs.Path => String): Array[InputPartition] = {
    val out = Array.newBuilder[InputPartition]
    val affected = scala.collection.mutable.LinkedHashMap
      .empty[String, (Set[Any], scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.datasources.PartitionedFile])]
    var idx = 0
    parts.foreach {
      case fp: FilePartition =>
        val (hit, clean) = fp.files.partition(pf => dv.contains(statKey(pf.toPath)))
        if (clean.nonEmpty) { out += FilePartition(idx, clean); idx += 1 }
        hit.foreach { pf =>
          val k = statKey(pf.toPath)
          affected.getOrElseUpdate(k,
            (dv(k), scala.collection.mutable.ArrayBuffer.empty))._2 += pf
        }
      case other => out += other
    }
    affected.valuesIterator.foreach { case (keys, pfs) =>
      out += DvPartition(FilePartition(idx, pfs.toArray), keys)
      idx += 1
    }
    out.result()
  }

  /** Reader factory applying DVs (and the widened-schema projection) around
    * the delegate's row-based readers. Columnar reads are kept for
    * unaffected partitions when no projection is needed; everything else
    * goes row-based (the Iceberg MOR trade — paid only until OPTIMIZE
    * folds the DVs away).
    */
  final class DvReaderFactory(inner: PartitionReaderFactory, info: DvScanInfo)
      extends PartitionReaderFactory {
    private val project: Option[Array[(Int, DataType, Boolean)]] =
      info.projectOrdinals.map(_.zip(info.outputSchema.fields).map { case (ord, f) =>
        (ord, f.dataType, f.nullable)
      })

    // BatchScanExec refuses MIXED row/columnar partitions, so a DV-active
    // scan reads everything row-based (the Iceberg MOR trade, paid only
    // until OPTIMIZE folds the DVs and the plain columnar path returns)
    override def supportColumnarReads(partition: InputPartition): Boolean = false

    private def projected(r: PartitionReader[InternalRow]): PartitionReader[InternalRow] =
      project.fold(r) { cols =>
        import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
        new PartitionReader[InternalRow] {
          private lazy val proj = UnsafeProjection.create(cols.toIndexedSeq.map {
            case (i, dt, n) => BoundReference(i, dt, n)
          })
          override def next(): Boolean = r.next()
          override def get(): InternalRow = proj(r.get())
          override def close(): Unit = r.close()
        }
      }

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case DvPartition(fp, deleted) =>
          val base = inner.createReader(fp)
          val ord = info.keyOrdinal
          val isInt = info.keyType == IntegerType
          val isLong = info.keyType == LongType
          val filtered = new PartitionReader[InternalRow] {
            private var current: InternalRow = _
            override def next(): Boolean = {
              while (base.next()) {
                val row = base.get()
                val keep =
                  if (row.isNullAt(ord)) true // NULL keys are never DV'd
                  else {
                    val k: Any =
                      if (isInt) row.getInt(ord).toLong
                      else if (isLong) row.getLong(ord)
                      else row.getUTF8String(ord).toString
                    !deleted.contains(k)
                  }
                if (keep) { current = row; return true }
              }
              false
            }
            override def get(): InternalRow = current
            override def close(): Unit = base.close()
          }
          projected(filtered)
        case other => projected(inner.createReader(other))
      }
  }
}
