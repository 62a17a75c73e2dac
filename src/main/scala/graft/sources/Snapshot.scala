package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Manifest-pinned snapshot table layer: versioned parquet with
  * snapshot-isolated reads and time travel.
  *
  * The reference refreshes by rewriting its artifacts in place
  * (reference server.js:100-137, and its README's upsert-strategy
  * discussion) — which leaves a concurrent reader exposed to a
  * half-updated table. This layer fixes that the way modern table
  * formats do: data files are IMMUTABLE once written, and a version
  * is just a manifest (a JSON file listing the parquet files that
  * make up that snapshot). Commits only ADD files and then publish a
  * new manifest with one atomic rename; a reader that resolved its
  * file list from manifest N keeps reading exactly version N's bytes
  * no matter how many commits, upserts, or compactions land after it.
  *
  * Layout under the table root:
  * {{{
  *   _versions/v000000001.json   one manifest per committed version
  *   data/<commit-uuid>/part-*   immutable data files, one dir/commit
  * }}}
  *
  * Manifest fields: version, op (init/replace/append/upsert/compact),
  * files (table-root-relative), batch_id (the streaming micro-batch
  * that produced the commit, null for batch ops), last_batch_id (the
  * running max across the table's history — the exactly-once cursor
  * for streaming sinks), ts_ms.
  *
  * Concurrency: optimistic, single-winner. The manifest is staged to
  * a temp name and promoted with `FileSystem.rename`, which fails if
  * the destination exists — two racing committers of version N+1
  * produce one winner; the loser's exception tells it to re-read and
  * retry. Readers never lock anything.
  *
  * Scale shape: manifests are O(files) text on the driver — at 100 TB
  * with 128 MB files that's ~800k entries per manifest, a few tens of
  * MB of metadata, read once per query plan (the same order as a
  * Hadoop directory listing, but consistent). [[upsert]] is
  * file-granular copy-on-write: only files that CONTAIN a changed key
  * are rewritten (found via the `_metadata.file_path` column, one
  * semi-join — no full-table rewrite), so a key-clustered layout
  * (Z-order / bucketing, see operators.Layout) bounds the rewrite to
  * the touched key range. [[compact]] and [[vacuum]] split table
  * maintenance from visibility: compaction publishes a new version
  * while old versions stay readable until vacuum reclaims them.
  */
object Snapshot {

  private val VersionsDir = "_versions"
  private val DataDir = "data"
  private def manifestName(v: Long): String = f"v$v%09d.json"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private final case class Manifest(version: Long, op: String,
      files: Seq[String], batchId: Option[Long], lastBatchId: Option[Long],
      tsMs: Long)

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val vd = new Path(dir, VersionsDir)
    if (!f.exists(vd)) Seq.empty
    else f.listStatus(vd).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{9}\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  private def readManifest(spark: SparkSession, dir: String, v: Long): Manifest = {
    val f = fs(spark, dir)
    val p = new Path(new Path(dir, VersionsDir), manifestName(v))
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    Manifest(
      (j \ "version").extract[Long],
      (j \ "op").extract[String],
      (j \ "files").extract[Seq[String]],
      (j \ "batch_id").extractOpt[Long],
      (j \ "last_batch_id").extractOpt[Long],
      (j \ "ts_ms").extract[Long])
  }

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val f = fs(spark, dir)
    val vd = new Path(dir, VersionsDir)
    f.mkdirs(vd)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"version":${m.version},"op":${q(m.op)},""" +
        s""""batch_id":${m.batchId.map(_.toString).getOrElse("null")},""" +
        s""""last_batch_id":${m.lastBatchId.map(_.toString).getOrElse("null")},""" +
        s""""ts_ms":${m.tsMs},""" +
        s""""files":[${m.files.map(q).mkString(",")}]}"""
    val tmp = new Path(vd, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val target = new Path(vd, manifestName(m.version))
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"version ${m.version} already committed at $dir — re-read latest and retry")
    }
  }

  /** Write `df`'s rows as a fresh immutable file set under data/ and
    * return the table-root-relative file paths.
    */
  private def writeDataFiles(spark: SparkSession, dir: String, df: DataFrame): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"$DataDir/$commitId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/$rel")
    val f = fs(spark, dir)
    f.listStatus(new Path(s"$dir/$rel")).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s"$rel/${s.getPath.getName}")
      .sorted
  }

  private def commitManifest(spark: SparkSession, dir: String, op: String,
      files: Seq[String], batchId: Option[Long]): Long = {
    val prev = latestVersion(spark, dir).map(readManifest(spark, dir, _))
    val v = prev.map(_.version + 1).getOrElse(1L)
    val last = (prev.flatMap(_.lastBatchId).toSeq ++ batchId.toSeq)
      .reduceOption((a: Long, b: Long) => math.max(a, b))
    writeManifest(spark, dir, Manifest(v, op, files, batchId, last,
      System.currentTimeMillis()))
    v
  }

  /** Publish `df` as the table's next FULL version (creates the table
    * at version 1). Returns the committed version.
    */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Option[Long] = None): Long = {
    val prevExists = latestVersion(spark, dir).isDefined
    val files = writeDataFiles(spark, dir, df)
    commitManifest(spark, dir, if (prevExists) "replace" else "init", files, batchId)
  }

  /** Append `df`'s rows as a new version: previous files carry over
    * untouched, only the new rows are written. The O(new data) ingest
    * path — at 100 TB this is what a micro-batch loader calls.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Option[Long] = None): Long = {
    val prev = latestVersion(spark, dir).map(readManifest(spark, dir, _))
      .map(_.files).getOrElse(Seq.empty)
    val files = writeDataFiles(spark, dir, df)
    commitManifest(spark, dir, "append", prev ++ files, batchId)
  }

  /** Snapshot-isolated read of a specific version. The file list is
    * resolved from the manifest ONCE, here — later commits, upserts,
    * compactions, even a vacuum of OTHER versions cannot change what
    * this frame reads.
    */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = readManifest(spark, dir, version)
    if (m.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.files.map(rel => s"$dir/$rel"): _*)
  }

  /** Read the latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed version at $dir")))

  /** Timestamp time travel: read the newest version committed at or
    * before `tsMs` (epoch millis) — "the table as the 09:00 job saw
    * it". Resolution is manifest commit time; fails loudly when the
    * timestamp predates the first retained version (vacuum defines how
    * far back this reaches, same contract as [[readVersion]]).
    */
  def readAsOf(spark: SparkSession, dir: String, tsMs: Long): DataFrame = {
    val v = versions(spark, dir)
      .map(v => v -> readManifest(spark, dir, v).tsMs)
      .filter(_._2 <= tsMs)
      .lastOption.map(_._1)
      .getOrElse(throw new IllegalStateException(
        s"no version at or before ts_ms=$tsMs at $dir (vacuumed or pre-history)"))
    readVersion(spark, dir, v)
  }

  /** Change data feed between two retained versions: what changes
    * batch turns version `from` into version `to`? One full-outer key
    * join ([[graft.operators.Merge.diff]]) — rows tagged added /
    * removed / changed with the `to`-side values (`from` values for
    * removals). The downstream-sync primitive: a consumer at version N
    * catches up to N+k by applying one diff instead of re-reading the
    * table.
    */
  def changes(spark: SparkSession, dir: String, from: Long, to: Long,
      keys: Seq[String]): DataFrame =
    graft.operators.Merge.diff(
      readVersion(spark, dir, from), readVersion(spark, dir, to), keys)

  /** The exactly-once cursor: highest streaming batch id ever
    * committed to this table (None for a pure-batch table).
    */
  def lastBatchId(spark: SparkSession, dir: String): Option[Long] =
    latestVersion(spark, dir).flatMap(v =>
      readManifest(spark, dir, v).lastBatchId)

  /** File-granular copy-on-write MERGE: apply `changes` (updates +
    * inserts + optional `deleteCol` tombstones, key-unique) onto the
    * latest version and publish the result as a new version.
    *
    * Only files CONTAINING a changed key are rewritten: one pass over
    * the current snapshot's `_metadata.file_path` semi-joined to the
    * change keys finds them; untouched files carry into the new
    * manifest verbatim. Inserts of brand-new keys ride the same
    * rewrite (the merge is a full outer join), and a tombstoned key's
    * file is by definition touched — so deletes need no extra pass.
    * The per-commit collect is O(touched files) strings on the
    * driver, bounded by the file count (never rows).
    */
  def upsert(spark: SparkSession, dir: String, changes: DataFrame,
      keys: Seq[String], deleteCol: Option[String] = None,
      batchId: Option[Long] = None): Long = {
    val prev = readManifest(spark, dir, latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed version at $dir — commit() first")))
    val current = if (prev.files.isEmpty) None
      else Some(spark.read.parquet(prev.files.map(rel => s"$dir/$rel"): _*))
    val touchedAbs: Seq[String] = current match {
      case None => Seq.empty
      case Some(cur) =>
        cur.select(keys.map(col) :+ col("_metadata.file_path").as("__fp"): _*)
          .join(changes.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(col("__fp")).distinct()
          .collect().map(_.getString(0)).toSeq
    }
    // _metadata.file_path is an absolute URI; manifest paths are
    // table-root-relative. Match on the BASENAME, which is globally
    // unique (each write job stamps its own UUID into part file
    // names), via a hash set — an O(files × touched) suffix scan
    // would be quadratic in the driver at a 100 TB table's ~1e6
    // manifest entries.
    val touchedNames = touchedAbs.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val touchedRel = prev.files.filter(rel =>
      touchedNames.contains(rel.substring(rel.lastIndexOf('/') + 1)))
    val untouched = prev.files.filterNot(touchedRel.contains)
    val base = if (touchedRel.isEmpty) {
      // all-new keys: merge against an empty slice of the current schema
      current.map(_.limit(0)).getOrElse(changes.drop(deleteCol.toSeq: _*).limit(0))
    } else spark.read.parquet(touchedRel.map(rel => s"$dir/$rel"): _*)
    val merged = graft.operators.Merge.upsert(
      base.drop(deleteCol.toSeq: _*), changes, keys, deleteCol)
    val newFiles = writeDataFiles(spark, dir, merged)
    commitManifest(spark, dir, "upsert", untouched ++ newFiles, batchId)
  }

  /** Compact the LATEST version's files toward `targetBytes` each and
    * publish the result as a new version. Unlike an in-place rewrite
    * (Writers.compact's rename swap), readers pinned to any existing
    * version are untouched — the old files stay until [[vacuum]].
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val prev = readManifest(spark, dir, latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed version at $dir")))
    val f = fs(spark, dir)
    val bytes = prev.files.map(rel => f.getFileStatus(new Path(s"$dir/$rel")).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(prev.files.map(rel => s"$dir/$rel"): _*).repartition(n)
    val files = writeDataFiles(spark, dir, df)
    commitManifest(spark, dir, "compact", files, None)
  }

  /** Garbage-collect: keep the newest `keepLast` versions, delete
    * older manifests and every data file no kept manifest references.
    * Returns the number of data files deleted. This is the ONLY
    * operation that removes bytes — retention policy is an explicit,
    * separate decision from compaction/upsert (a reader pinned to a
    * vacuumed version fails loudly on its next scan, which is the
    * contract: retention defines how long time travel reaches back).
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 2,
      orphanGraceMs: Long = 24L * 3600 * 1000): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val f = fs(spark, dir)
    val keepFiles = keep.flatMap(readManifest(spark, dir, _).files).toSet
    val dropFiles = drop.flatMap(readManifest(spark, dir, _).files).toSet -- keepFiles
    dropFiles.foreach(rel => f.delete(new Path(s"$dir/$rel"), false))
    drop.foreach(v => f.delete(new Path(new Path(dir, VersionsDir), manifestName(v)), false))
    // Orphan sweep: data files referenced by NO manifest at all — the
    // residue of a commit that lost the optimistic race after writing
    // its files (writeDataFiles succeeded, manifest rename didn't).
    // Only files older than the grace window are swept, so an
    // IN-FLIGHT commit (files written, manifest about to publish)
    // is never collected — the same mtime-retention rule table
    // formats use.
    val referenced = versions(spark, dir)
      .flatMap(readManifest(spark, dir, _).files).toSet
    val dataRoot = new Path(dir, DataDir)
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val orphans =
      if (!f.exists(dataRoot)) Seq.empty
      else f.listStatus(dataRoot).toSeq.filter(_.isDirectory).flatMap(d =>
        f.listStatus(d.getPath).toSeq.filter(_.isFile)
          .filter(_.getModificationTime < cutoff)
          .map(s => s"$DataDir/${d.getPath.getName}/${s.getPath.getName}")
          .filterNot(referenced)
          // a _SUCCESS/_committed marker in an orphaned commit dir is
          // part of the same garbage
          .filterNot(rel => referenced.exists(_.startsWith(
            rel.substring(0, rel.lastIndexOf('/') + 1)))))
    orphans.foreach(rel => f.delete(new Path(s"$dir/$rel"), false))
    // remove now-empty commit dirs (cosmetic; harmless if racing)
    (dropFiles ++ orphans).map(rel => rel.substring(0, rel.lastIndexOf('/'))).foreach { d =>
      val p = new Path(s"$dir/$d")
      if (f.exists(p) && f.listStatus(p).forall(s =>
          s.getPath.getName.startsWith("_") || s.getPath.getName.startsWith(".")))
        f.delete(p, true)
    }
    dropFiles.size + orphans.size
  }

  /** Test hook: attempt to publish an (empty) manifest at an explicit
    * version — exercises the rename-if-absent single-winner primitive
    * without having to time a real race.
    */
  private[graft] def publishManifestForTest(spark: SparkSession, dir: String,
      version: Long): Unit =
    writeManifest(spark, dir, Manifest(version, "replace", Seq.empty, None,
      None, System.currentTimeMillis()))

  /** Table history as a DataFrame: one row per retained version. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    versions(spark, dir).map { v =>
      val m = readManifest(spark, dir, v)
      (m.version, m.op, m.files.size.toLong, m.batchId, m.lastBatchId)
    }.toDF("version", "op", "n_files", "batch_id", "last_batch_id")
  }
}
