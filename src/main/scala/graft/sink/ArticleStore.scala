package graft.sink

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField}

import graft.funcs.Funcs
import graft.model.ArticleSchema

/** The engine's keyed, upsertable serving table — the Spark re-expression of
  * the reference's SQLite `articles` sink (K1/K2/K3/S5/T1 in SURVEY.md §2).
  *
  * Plain parquet has no keyed upsert, so merge is the anti-join + union
  * rewrite (reference upsert: database_utils/database_methods.py:68-107)
  * over a HASH-BUCKETED, MANIFEST-VERSIONED layout:
  *
  * {{{
  *   base/_CURRENT          atomically-swapped pointer: current version N
  *   base/vN/manifest       numBuckets + (bucket -> version holding its data)
  *   base/vN/data/__bucket=i/part-*.parquet   buckets REWRITTEN at version N
  * }}}
  *
  * A merge rewrites ONLY the buckets containing batch keys; every other
  * bucket's manifest entry keeps pointing at the older version's files,
  * which are never copied or rewritten. Incremental cost is
  * O(affected buckets), not O(stored table) — at 100 TB with 2^10+ buckets
  * an upsert of one run's articles touches a few GB, not the whole table.
  *
  * Concurrency contract: readers resolve a snapshot via one atomic pointer
  * read and see a consistent version; the pointer swap is a true atomic
  * rename (FileContext + OVERWRITE — no delete-then-rename window).
  * Writers use optimistic concurrency: a merge atomically CLAIMS its
  * target version (exclusive `_claim` create) and re-checks the pointer
  * before the swap, so of two racing merges exactly one commits and the
  * other aborts with [[ArticleStore.ConcurrentMergeException]] having
  * written nothing durable. GC retains the last
  * [[ArticleStore.RetainVersions]] manifests and every version directory
  * they reference, so readers up to K-1 versions stale never lose files
  * under them.
  */
final class ArticleStore(spark: SparkSession, basePath: String,
                         keyCol: String = ArticleSchema.ArticleId,
                         numBuckets: Int = 16) {
  import ArticleStore._

  private val base = new Path(basePath)
  private def conf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = base.getFileSystem(conf)
  private val pointer = new Path(base, "_CURRENT")

  /** K2 — CREATE TABLE IF NOT EXISTS: an empty v0 with all buckets. */
  def create(): Unit = if (!fs.exists(pointer)) {
    fs.mkdirs(dataPath(0L))
    writeManifest(0L, Array.fill(numBuckets)(0L))
    publish(0L)
  }

  /** K3 — DROP TABLE. */
  def drop(): Unit = if (fs.exists(base)) { fs.delete(base, true); () }

  def exists: Boolean = fs.exists(pointer)

  private def currentVersion: Long = {
    val in = fs.open(pointer)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
    finally in.close()
  }

  private def versionPath(v: Long) = new Path(base, s"v$v")
  private def dataPath(v: Long) = new Path(versionPath(v), "data")
  private def manifestPath(v: Long) = new Path(versionPath(v), "manifest")

  private def writeManifest(v: Long, buckets: Array[Long]): Unit = {
    val out = fs.create(manifestPath(v), true)
    try out.write(s"${buckets.length}\n${buckets.mkString(",")}\n".getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(v: Long): Array[Long] = {
    val in = fs.open(manifestPath(v))
    val txt =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val lines = txt.trim.split("\n")
    val buckets = lines(1).split(",").map(_.toLong)
    require(buckets.length == lines(0).trim.toInt, s"corrupt manifest v$v")
    buckets
  }

  /** Atomic pointer swap — rename with OVERWRITE, never delete-then-rename,
    * so a concurrent reader always sees either the old or the new version.
    */
  private def publish(v: Long): Unit = {
    val tmp = new Path(base, s"_CURRENT.tmp$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.makeQualified(base).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(pointer),
      Options.Rename.OVERWRITE)
  }

  /** Data-file schema: the article columns plus the bucket partition col. */
  private def dataSchema =
    org.apache.spark.sql.types.StructType(
      ArticleSchema.schema.fields :+ StructField(BucketCol, IntegerType))

  private def readBuckets(v: Long, buckets: Seq[Int]): DataFrame =
    spark.read.schema(dataSchema).parquet(dataPath(v).toString)
      .filter(col(BucketCol).isin(buckets: _*)) // prunes partition dirs

  private def scanAt(v: Long): DataFrame = scanManifest(readManifest(v))

  private def scanManifest(man: Array[Long]): DataFrame =
    man.zipWithIndex.groupBy(_._1).toSeq
      .map { case (ver, bs) => readBuckets(ver, bs.map(_._2).toSeq) }
      .reduce(_ unionByName _)

  /** S6 — serving-table scan of the current snapshot. */
  def read(): DataFrame =
    scanAt(currentVersion).select(ArticleSchema.columns.map(col): _*)

  /** Time travel: the table as of `version`, resolved through exactly the
    * bucket→version mapping that manifest recorded (the same mechanism
    * [[read]] uses for the current pointer). Readable = within the GC
    * retention window AND committed: a bare manifest-existence check
    * would admit (a) versions whose manifest survived GC while some data
    * dir they reference was collected (scan fails mid-read) and (b) an
    * uncommitted manifest left by a merge that crashed before its
    * pointer swap (dirty read).
    */
  def readAt(version: Long): DataFrame = {
    val cur = currentVersion
    require(version <= cur && version > cur - RetainVersions &&
        fs.exists(manifestPath(version)),
      s"version $version is not retained (committed versions " +
        s"${math.max(0L, cur - (RetainVersions - 1))}..$cur are)")
    scanAt(version).select(ArticleSchema.columns.map(col): _*)
  }

  /** Table history, newest first: each retained version with its row
    * count and how many buckets that version rewrote (v0 is the empty
    * CREATE — it owns every manifest entry but wrote nothing). Driver-
    * side by design — at most [[ArticleStore.RetainVersions]] entries.
    */
  def history(): Seq[VersionInfo] = {
    val v = currentVersion
    (v to math.max(0L, v - (RetainVersions - 1)) by -1)
      .filter(r => fs.exists(manifestPath(r)))
      .map { r =>
        val man = readManifest(r)
        val rewritten = if (r == 0) 0 else man.count(_ == r)
        VersionInfo(r, scanManifest(man).count(), rewritten)
      }
  }

  /** Optimistic concurrency acquire: claim version `v` by atomically
    * PUBLISHING a token-bearing `_claim` marker — the filesystem's
    * atomic no-overwrite link/rename is the compare-and-swap, and the
    * token travels INSIDE it, so claim acquisition and token persistence
    * are one step: a claim is never readable without its final token,
    * and no second write exists for a stalled writer to clobber a
    * successor's token with. Exactly one of two concurrent merges that
    * both read the same base version can publish `v(N+1)/_claim`; the
    * loser aborts cleanly before writing a byte of data, so no writer's
    * buckets are ever silently dropped.
    *
    * The token is the FENCE: the committing writer re-reads the marker
    * immediately before the pointer swap ([[merge]]); if an operator
    * [[abandonClaim]]'d this writer (wrongly judging it dead) and a
    * successor re-claimed the slot, the token differs and the fenced
    * writer aborts instead of publishing over the successor's work. A
    * claim left by a CRASHED writer blocks new merges until
    * [[abandonClaim]] — deliberately manual, because a lease-less store
    * cannot distinguish a crashed writer from a slow live one, and
    * auto-stealing would re-open the lost-update window.
    */
  private def claim(v: Long): String = {
    fs.mkdirs(versionPath(v))
    val p = claimPath(v)
    val token = java.util.UUID.randomUUID().toString
    val tmp = new Path(versionPath(v), s"_claim.tmp.$token")
    val out = fs.create(tmp, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
    try {
      if ("file" == fs.getUri.getScheme)
        // POSIX link(2): atomic no-overwrite publish for the file://
        // stores tests and single-box deployments run on (NIO's move
        // without REPLACE_EXISTING is a non-atomic check-then-rename).
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(p).toUri),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri))
      else {
        // HDFS-like stores: rename WITHOUT Overwrite is atomic on the
        // NameNode and fails if the destination exists.
        val fc = FileContext.getFileContext(fs.makeQualified(base).toUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(p))
      }
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentMergeException(
          s"version $v is already claimed by another writer " +
            "(or left by a crashed one — see abandonClaim)")
    } finally {
      // hard-link publish leaves the temp name behind; rename consumes it
      if (fs.exists(tmp)) { fs.delete(tmp, false); () }
    }
    token
  }

  private def claimToken(v: Long): Option[String] = {
    if (!fs.exists(claimPath(v))) None
    else {
      val in = fs.open(claimPath(v))
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private def claimPath(v: Long) = new Path(versionPath(v), "_claim")

  /** Operator-invoked crash recovery: discard an UNCOMMITTED claim on the
    * next version so merges can proceed. Refuses to touch a committed
    * version (re-checked at the last instant), and the fencing token
    * means a claiming writer that turns out to be alive aborts at its
    * pre-publish token check rather than colliding with a successor.
    * The residual window — the live writer passes its token check while
    * this delete lands — needs a real lock service to close completely;
    * a filesystem store narrows it to microseconds and documents it.
    * Call only once the claiming writer is believed dead.
    */
  def abandonClaim(): Unit = {
    val cur = currentVersion
    val next = cur + 1
    if (fs.exists(claimPath(next)) && currentVersion == cur) {
      fs.delete(versionPath(next), true); ()
    }
  }

  /** K1 — keyed upsert: new rows win over stored rows with the same key;
    * every surviving incoming row gets a fresh Processed_at
    * (reference: database_utils/database_methods.py:84-94). Reads and
    * rewrites ONLY the buckets containing batch keys.
    *
    * Concurrency: the merge CLAIMS its target version up front (atomic
    * exclusive create) and re-checks the pointer immediately before the
    * swap; a concurrent merge that won the claim — or anything that
    * moved the pointer underneath us — aborts this writer with
    * [[ConcurrentMergeException]] and its partial version directory is
    * removed. Retry by re-running the merge against the new snapshot.
    */
  def merge(batch: DataFrame): Unit = {
    create()
    val v = currentVersion
    val man = readManifest(v)
    val stamped = dedupeLatest(batch, keyCol)
      .withColumn(ArticleSchema.ProcessedAt, Funcs.processedNow())
      .select(ArticleSchema.columns.map(col): _*)
      .withColumn(BucketCol, pmod(hash(col(keyCol)), lit(man.length)))
      .cache()
    try {
      // The affected-bucket set is at most numBuckets ints — driver-safe.
      val affected = stamped.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).sorted
      if (affected.nonEmpty) {
        val token = claim(v + 1)
        var committed = false
        try {
          val old = affected.groupBy(b => man(b)).toSeq
            .map { case (ver, bs) => readBuckets(ver, bs.toSeq) }
            .reduce(_ unionByName _)
          // Incremental batches are small: broadcast the key set so the
          // anti-join is a single shuffle-free pass over the stored buckets.
          val merged = old
            .join(broadcast(stamped.select(keyCol)), Seq(keyCol), "left_anti")
            .unionByName(stamped)
          merged.repartition(affected.length, col(BucketCol))
            .write.mode("overwrite").partitionBy(BucketCol)
            .parquet(dataPath(v + 1).toString)
          val newMan = man.clone()
          affected.foreach(b => newMan(b) = v + 1)
          writeManifest(v + 1, newMan)
          // CAS commit: our base version must still be current AND our
          // fencing token must still be on the claim. The claim already
          // excludes racing merges; the pointer check catches movement
          // that bypassed the protocol, and the token check fences a
          // writer whose claim was abandoned (and possibly re-claimed)
          // while it was presumed dead.
          val cur = currentVersion
          if (cur != v)
            throw new ConcurrentMergeException(
              s"pointer moved to v$cur while merging from v$v; aborting")
          if (!claimToken(v + 1).contains(token))
            throw new ConcurrentMergeException(
              s"claim on v${v + 1} was abandoned or re-claimed; aborting")
          publish(v + 1)
          committed = true
          gc(v + 1)
        } finally {
          // Abort cleanup must never touch a version that is not OURS
          // anymore: not one someone else COMMITTED (pointer moved to
          // v+1 — deleting would destroy the current snapshot), and not
          // one a successor RE-CLAIMED after our claim was abandoned
          // (token mismatch — deleting would destroy their in-progress
          // write). Only a version still carrying our own fencing token
          // is ours to remove.
          if (!committed && currentVersion <= v
              && claimToken(v + 1).contains(token)) {
            fs.delete(versionPath(v + 1), true); ()
          }
        }
      }
    } finally { stamped.unpersist(); () }
  }

  /** Delete OLD version directories referenced by none of the last
    * [[RetainVersions]] manifests. Strictly bounded above by the
    * committing version: a directory numbered PAST `v` is a concurrent
    * writer's claimed in-progress version — deleting it would destroy
    * that writer's data mid-merge and its `_claim` marker with it,
    * reopening the lost-update race the claim protocol closes.
    */
  private def gc(v: Long): Unit = {
    val retained = (math.max(0L, v - (RetainVersions - 1)) to v)
      .filter(r => fs.exists(manifestPath(r)))
    val referenced = retained.toSet ++ retained.flatMap(readManifest(_).toSet)
    fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.drop(1).forall(_.isDigit)
          && n.drop(1).toLong < v
          && !referenced.contains(n.drop(1).toLong))
        fs.delete(st.getPath, true)
    }
  }

  /** S5 — watermark read: `date_trunc(DAY, max(publish_time))`, cold-start
    * fallback to the fixed default; also reports whether the run is
    * incremental (reference: database_utils/database_methods.py:40-66).
    */
  def watermark(): (Timestamp, Boolean) = {
    val row = read()
      .agg(Funcs.truncToDay(max(col(ArticleSchema.NewsPublishedTime))).as("wm"))
      .head()
    if (row.isNullAt(0))
      (Timestamp.valueOf(ArticleSchema.DefaultWatermark.replace('T', ' ')), false)
    else (row.getTimestamp(0), true)
  }

  /** T1 — top-N serving query. Catalyst plans Sort+Limit as
    * TakeOrderedAndProject: a bounded per-partition heap + driver merge, no
    * full sort even at 100 TB (reference: database_utils/database_methods.py:109-130).
    */
  def topN(n: Int = 5): DataFrame =
    read().orderBy(col(ArticleSchema.NewsPublishedTime).desc,
                   col(ArticleSchema.ArticleId))
      .limit(n)

  /** K4 — console sink: print the top-N rows in the reference's output
    * format (reference: database_utils/database_methods.py:127-128).
    */
  def printTopN(n: Int = 5): Unit =
    ArticleStore.renderServing(topN(n)).show(n, truncate = false)
}

object ArticleStore {
  /** One [[ArticleStore.history]] entry. */
  final case class VersionInfo(version: Long, rows: Long, rewrittenBuckets: Int)

  /** A concurrent merge claimed/published the target version first (or
    * the pointer moved underneath the writer). The losing merge wrote
    * nothing durable; retry against the new current snapshot.
    */
  final class ConcurrentMergeException(msg: String) extends RuntimeException(msg)

  /** Hash-bucket partition column in the stored layout. */
  val BucketCol = "__bucket"

  /** Serving-edge rendering: timestamps back to the reference's two string
    * formats — T-separated publish time, space-separated Processed_at
    * (SURVEY.md §1.4) — so output is drop-in comparable with the golden
    * data/articles.db rows.
    */
  def renderServing(df: DataFrame): DataFrame =
    df.select(
      col(ArticleSchema.ArticleId), col(ArticleSchema.NewsLink),
      col(ArticleSchema.NewsTitle), col(ArticleSchema.AuthorName),
      Funcs.isoWithT(col(ArticleSchema.NewsPublishedTime))
        .as(ArticleSchema.NewsPublishedTime),
      col(ArticleSchema.SourceName),
      Funcs.isoWithSpace(col(ArticleSchema.ProcessedAt))
        .as(ArticleSchema.ProcessedAt))

  /** Manifests (and every version dir they reference) kept for readers up
    * to K-1 versions stale.
    */
  val RetainVersions = 3

  /** Q4 tie-breaking for one batch: one row per key, newest publish time
    * wins (matches the reference's newest-first page order where the first
    * occurrence of a URL is kept — SURVEY.md §4 "Ordering"). News_link is a
    * deterministic second tie-break so same-key same-time rows always pick
    * the same winner across retries/partitionings.
    */
  def dedupeLatest(batch: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ArticleSchema.NewsPublishedTime).desc_nulls_last,
               col(ArticleSchema.NewsLink).asc_nulls_last)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
