package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Change-feed cursor protocol shared by the persisted indexes
  * ([[IvfIndex]], [[LexIndex]]): an index tracking a
  * [[ManifestedLog]] records "content reflects log version V" in two
  * complementary places —
  *
  *  1. a SYNC TAG in the segment name the sync's append published
  *     (`…-b<logtag>-<from>-<to>`): the cursor advance and the synced
  *     segment share ONE atomic manifest rename, so "delta landed" and
  *     "cursor moved" cannot diverge — the exactly-once core;
  *  2. a BASE FILE (`_sync/base-<logtag>.txt`): the build-time starting
  *     point, and the carry-forward target when maintenance verbs fold
  *     tagged segments away.
  *
  * The effective cursor is the max of both. [[persistCursors]] is the
  * carry-forward: called by compact-style verbs BEFORE they publish a
  * folded manifest, it writes every tag's upper bound into the base
  * file — the base only ever advances to a version the still-live
  * manifest's tags already attest, so a crash between the base write
  * and the fold's publish leaves the cursor unchanged either way, and
  * a completed fold cannot regress it (which would make the next sync
  * replay — and duplicate — an already-ingested delta).
  */
private[operators] object SyncCursors {

  /** Stable short id for a source log path — rides in sync batch tags
    * (`log<h>-<from>-<to>`) and the base filename, so one index can
    * track several logs without the cursors colliding. */
  def logTag(logPath: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(new Path(logPath).toUri.getPath.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"log$h"
  }

  /** `_sync/` is a sidecar namespace (underscore-prefixed, like the
    * log's `_pins/`): never part of the manifest/segment sweep. */
  def baseFile(root: Path, tag: String): Path =
    new Path(root, s"_sync/base-$tag.txt")

  def readBase(f: FileSystem, root: Path, tag: String): Option[Long] = {
    val bf = baseFile(root, tag)
    if (!f.exists(bf)) None
    else {
      val in = f.open(bf)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      Some(text.trim.toLong)
    }
  }

  /** Atomic tmp+rename overwrite of the base file. */
  def writeBase(f: FileSystem, root: Path, tag: String, version: Long): Unit = {
    val target = baseFile(root, tag)
    f.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${target.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$version\n".getBytes("UTF-8")) finally out.close()
    f.delete(target, false)
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      sys.error(s"publishing sync base $target lost a race")
    }
  }

  /** Every sync tag's (logtag → max synced-to) in a segment name list. */
  private val SyncTagRe = "-b(log[0-9a-f]{12})-(\\d+)-(\\d+)$".r

  def tagUpperBounds(segments: Seq[String]): Map[String, Long] =
    segments
      .flatMap(n => SyncTagRe.findFirstMatchIn(n)
        .map(m => m.group(1) -> m.group(3).toLong))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).max }

  /** The log version an index's content reflects: max of the base file
    * and the given tag's upper bounds in the live manifest's segments. */
  def syncedVersion(f: FileSystem, root: Path, tag: String,
                    segments: Seq[String]): Option[Long] =
    (readBase(f, root, tag).toSeq ++
      tagUpperBounds(segments).get(tag).toSeq).maxOption

  /** Carry every log's cursor into its base file before a fold discards
    * the tagged segment names (advance-only — never regresses a base a
    * racer already pushed further). */
  def persistCursors(f: FileSystem, root: Path, segments: Seq[String]): Unit =
    tagUpperBounds(segments).foreach { case (tag, to) =>
      if (readBase(f, root, tag).forall(_ < to)) writeBase(f, root, tag, to)
    }
}
