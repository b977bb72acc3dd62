package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Reader pins shared by every versioned store ([[ManifestedLog]], the
  * persisted indexes [[IvfIndex]] and [[LexIndex]]): a named pin holds
  * one published version against maintenance sweeps, so a long-running
  * reader (an evaluation replaying a fixed index version, a change-feed
  * consumer mid-catchup) cannot lose its manifest to a concurrent
  * vacuum.
  *
  * The pin-vs-vacuum race closes with a symmetric two-step handshake —
  * each side publishes its claim, then checks the other's:
  *
  *  - [[pin]] writes `_pins/pin-<name>.txt` atomically, then re-verifies
  *    the manifest still exists. If a sweep's trash-rename won, the pin
  *    protected nothing: it removes itself and fails LOUDLY at pin time,
  *    where the reader can still react — never a silently useless pin.
  *  - [[sweepManifests]] (the vacuum side) TRASH-RENAMES each doomed
  *    manifest aside (atomic), re-reads `_pins/` (tiny), then restores
  *    the manifest if a pin landed, else drops it. A pin that lands
  *    before the re-read restores; one that lands after finds the
  *    manifest missing in its own verify step and fails there. No
  *    interleaving leaves a pin silently protecting nothing.
  *
  * Every store parameterizes only its manifest file naming — the
  * protocol, spec-pinned by ManifestedLogSpec and mirrored by
  * IvfIndexSpec/LexIndexSpec, is one implementation.
  */
private[operators] object Pins {

  private val PinRe = "pin-(.+)\\.txt".r
  private def pinsDir(root: Path) = new Path(root, "_pins")

  /** Register (or move) the named pin onto a RETAINED version. Returns
    * the pinned version. Pin BEFORE starting the long read: a pin
    * created after a racing vacuum already deleted the version fails
    * here, loudly, instead of silently protecting nothing. Re-pinning
    * an existing name replaces it (delete + rename — the crash window
    * between the two leaves the name unpinned; a restarting reader
    * re-pins as its first step, which is also what makes the window
    * harmless). */
  def pin(f: FileSystem, root: Path, name: String, version: Long,
          retained: Seq[Long], manifestFile: Long => String): Long = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"pin names are [A-Za-z0-9_-]+, got '$name'")
    if (!retained.contains(version)) sys.error(
      s"cannot pin version $version of $root: not retained " +
        s"(have: ${retained.mkString(", ")})")
    val dir = pinsDir(root)
    if (!f.exists(dir)) f.mkdirs(dir)
    val target = new Path(dir, s"pin-$name.txt")
    val tmp = new Path(dir, s".pin-$name.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$version\n".getBytes("UTF-8")) finally out.close()
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      sys.error(s"publishing pin $target failed; tmp content is in $tmp")
    // re-verify AFTER publishing — this side's half of the handshake
    if (!f.exists(new Path(root, manifestFile(version)))) {
      f.delete(target, false)
      sys.error(
        s"version $version of $root was vacuumed while pin '$name' was " +
          "being created — the pin would protect nothing; re-resolve the " +
          "newest version and pin again")
    }
    version
  }

  /** Drop the named pin; true if it existed. */
  def unpin(f: FileSystem, root: Path, name: String): Boolean =
    f.delete(new Path(pinsDir(root), s"pin-$name.txt"), false)

  /** All registered pins, name → version. */
  def pins(f: FileSystem, root: Path): Map[String, Long] = {
    val dir = pinsDir(root)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).flatMap { st =>
      st.getPath.getName match {
        case PinRe(name) =>
          val in = f.open(st.getPath)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                     finally in.close()
          Some(name -> text.trim.toLong)
        case _ => None
      }
    }.toMap
  }

  /** The vacuum side of the handshake: for each version in `drop`,
    * trash-rename its manifest aside, re-read the pins, and either
    * restore (a pin landed — the version joins the kept set) or delete.
    * Returns (versions additionally kept by racing pins, paths
    * removed). */
  def sweepManifests(f: FileSystem, root: Path, drop: Seq[Long],
                     manifestFile: Long => String): (Set[Long], Long) = {
    val alsoKept = scala.collection.mutable.Set.empty[Long]
    var removed = 0L
    drop.foreach { v =>
      val mf = new Path(root, manifestFile(v))
      val token = java.util.UUID.randomUUID().toString.take(8)
      val trash = new Path(root, s".vacuum-trash-$v-$token")
      if (f.rename(mf, trash)) {
        if (pins(f, root).values.exists(_ == v)) {
          if (!f.rename(trash, mf)) sys.error(
            s"restoring pinned manifest $mf from $trash failed — " +
              "restore it manually before the next sweep")
          alsoKept += v
        } else { f.delete(trash, false); removed += 1 }
      }
    }
    (alsoKept.toSet, removed)
  }
}
