package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The manifest-publish primitive: expose a fully-written `tmp` file as
  * `target` ATOMICALLY, FAILING if `target` already exists.
  *
  * A bare `FileSystem.rename` is NOT that operation on a local
  * filesystem: POSIX rename(2) silently REPLACES an existing target,
  * and the checksum layer's refusal of existing targets is
  * check-then-rename — two publishers racing the same manifest version
  * can both pass the check and both "succeed", the second silently
  * clobbering the first (measured here: ~15% of 4-way contended rounds
  * produced two winning renames onto one target). That was the
  * root cause of the long-flaky racing-appenders convergence: both
  * appends returned success, the final manifest was the loser's, and
  * one batch was silently lost — an exactly-once violation, not a test
  * artifact.
  *
  * A hard link IS that operation on POSIX: link(2) never overwrites
  * and fails atomically with EEXIST, and the link exposes the complete
  * file content in one metadata operation (tmp is fully written and
  * closed first). So local targets publish by link-then-delete-tmp.
  * Non-local filesystems keep the rename: HDFS refuses an existing
  * rename target atomically at the NameNode, which is exactly the
  * semantics this helper guarantees. (Object stores without atomic
  * namespace operations need an external commit arbiter for ANY
  * manifest-based table format — a documented deployment constraint,
  * not something a client-side protocol can conjure.)
  */
private[operators] object FsAtomic {

  /** True = published; false = the target already existed (the
    * caller's lost-race signal — callers throw
    * [[ConcurrentWriteException]] and retry against the winner). */
  def renameNoReplace(f: FileSystem, tmp: Path, target: Path): Boolean =
    if (f.getScheme == "file") {
      val tmpNio = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
      val tgtNio = java.nio.file.Paths.get(f.makeQualified(target).toUri.getPath)
      try {
        java.nio.file.Files.createLink(tgtNio, tmpNio)
        f.delete(tmp, false) // also drops the checksum sidecar
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // a mount without hard links: fall back to the rename and
          // its (weaker) existing-target refusal
          f.rename(tmp, target)
      }
    } else f.rename(tmp, target)
}
