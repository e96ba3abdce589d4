package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** A concurrent writer asked for a store root another writer holds. */
final class LeaseHeldException(msg: String) extends RuntimeException(msg)

/** Writer lease on a store root — the multi-writer guard the generation
  * protocol itself deliberately does not provide ([[StoreGen]] scaladoc:
  * "single writer"). Without it, two scheduled `foldSegments` /
  * `compactStream` writers both compute `next = cur + 1` and each
  * `prepare` deletes generations above `_CURRENT` — i.e. the OTHER
  * writer's in-flight `_gen` dir — so the race ends in a deleted-dir
  * job failure or a last-commit-wins pointer.
  *
  * Protocol: a `root/_LEASE` file created EXCLUSIVELY (create with
  * overwrite=false — atomic on local/HDFS) holding the owner id; a
  * daemon heartbeat refreshes the file's mtime every `staleMs / 3`, so
  * a lease whose mtime is older than `staleMs` belongs to a DEAD holder
  * (crashed before release) and may be broken by the next acquirer.
  * A live lease is refused LOUDLY ([[LeaseHeldException]]) — a refused
  * fold is a scheduling no-op to retry, never silent corruption.
  *
  * Atomicity, by filesystem: on LOCAL roots the create goes through
  * `java.nio` `createFile` (true O_EXCL — Hadoop's local
  * `create(overwrite=false)` is only check-then-act); on HDFS,
  * `create(overwrite=false)` is namenode-atomic. A STALE lease is
  * broken by atomic RENAME to a unique tombstone — of two concurrent
  * breakers only one renames successfully, so the loser falls through
  * to the exclusive create and is refused; a delete-then-recreate
  * break would let the loser delete the winner's fresh lease.
  * Object-store caveat (same family as StoreGen's pointer-swap note):
  * S3-style stores implement both primitives as check-then-write, so
  * two writers racing within one round-trip can both "win"; there, back
  * this file with the store's conditional-put primitive. On
  * local/HDFS — and for the real failure mode here, two SCHEDULED folds
  * minutes apart — the protocol is authoritative.
  */
object StoreLease {

  val LeaseFile = "_LEASE"

  /** Default staleness: generous against long GC pauses (the heartbeat
    * only has to land once per window), short against a crashed holder
    * blocking the schedule for hours.
    */
  val DefaultStaleMs: Long = 10L * 60 * 1000

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def defaultHolder(): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: java.net.UnknownHostException => "unknown-host" }
    s"$host:pid-${ProcessHandle.current().pid()}:t-${Thread.currentThread().getId}"
  }

  /** A held lease: heartbeats until [[release]]. Always release in a
    * `finally` (or use [[withLease]]); an unreleased lease parks the
    * root until staleness.
    */
  final class Lease private[StoreLease] (
      f: FileSystem, val path: Path, val holder: String, staleMs: Long) {
    @volatile private var released = false
    @volatile private var lostFlag = false
    private def stillMine(): Option[Boolean] =
      try Some(readHolder(f, path).contains(holder))
      catch { case _: java.io.IOException => None } // transient: unknown

    /** True once the heartbeat observed ANOTHER holder's id in the
      * lease file — this process was suspended past staleness and a
      * successor broke the lease. The fold that thinks it holds this
      * lease must not commit; see [[ensureHeld]].
      */
    def isLost: Boolean = lostFlag

    /** Call immediately before a pointer-swap commit: a zombie writer
      * (suspended past staleMs, lease stale-broken by a successor)
      * must refuse to publish rather than race the successor's
      * generation prune. A narrow observe-then-commit window remains —
      * closing it fully needs a conditional-put the FileSystem API
      * doesn't offer — but the check turns an unbounded double-writer
      * overlap into one bounded by a heartbeat period.
      */
    def ensureHeld(): Unit =
      if (lostFlag) throw new LeaseHeldException(
        s"writer lease on $path was stale-broken by another holder while " +
          "this process was paused — refusing to commit over the successor")

    private val beat = new Thread(() => {
      try {
        while (!released && !lostFlag) {
          Thread.sleep(math.max(staleMs / 3, 50L))
          // a transient refresh failure must NOT kill the heartbeat for
          // the lease's lifetime (a long fold would silently go stale
          // and invite a concurrent breaker) — retry next tick; stop
          // only when the file verifiably names another holder (our
          // lease was broken while this process was suspended)
          if (!released) stillMine() match {
            case Some(false) => lostFlag = true
            case _ =>
              // mtime refresh, not a rewrite: readers of the lease file
              // never observe a partially written holder id
              try f.setTimes(path, System.currentTimeMillis(), -1)
              catch { case _: java.io.IOException => () }
          }
        }
      } catch { case _: InterruptedException => () } // release() woke us
    }, s"graft-lease-heartbeat:$path")
    beat.setDaemon(true)
    beat.start()

    def release(): Unit = {
      released = true
      beat.interrupt()
      // delete only OUR lease: after a stale break the file may be a
      // successor's live lease. A transient read failure retries; if
      // the read never lands the file is LEFT IN PLACE — a wrongly
      // kept lease costs at most staleMs of loud refusals, a wrongly
      // deleted successor's lease costs a silent double-writer.
      var attempt = 0
      var done = false
      while (!done && attempt < 3) {
        attempt += 1
        try {
          if (readHolder(f, path).contains(holder)) f.delete(path, false)
          done = true
        } catch {
          case _: java.io.IOException => if (attempt < 3) Thread.sleep(50L)
        }
      }
    }
  }

  private def readHolder(f: FileSystem, p: Path): Option[String] =
    try {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().nextOption()
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Acquire the writer lease on `root`, breaking a stale one; throws
    * [[LeaseHeldException]] when a live holder has it.
    */
  def acquire(spark: SparkSession, root: String,
      holder: String = defaultHolder(),
      staleMs: Long = DefaultStaleMs): Lease = {
    require(staleMs > 0, s"staleMs must be positive, got $staleMs")
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    val p = new Path(root, LeaseFile)
    val bytes = s"$holder\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val localFile = "file" == Option(f.getScheme).getOrElse("")
    def tryCreate(): Boolean =
      try {
        if (localFile) {
          // Hadoop's local create(overwrite=false) is exists()-then-open
          // (check-then-act); java.nio createFile is true O_EXCL
          val nio = java.nio.file.Paths.get(p.toUri.getPath)
          java.nio.file.Files.createFile(nio)
          java.nio.file.Files.write(nio, bytes)
        } else {
          val out = f.create(p, false) // overwrite=false: namenode-atomic on HDFS
          try out.write(bytes) finally out.close()
        }
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false // incl. Hadoop FileAlreadyExists
      }
    def refuse(): Nothing = {
      val who =
        try readHolder(f, p).getOrElse("unknown")
        catch { case _: java.io.IOException => "unknown" }
      throw new LeaseHeldException(
        s"store root $root is write-leased by '$who' ($LeaseFile present and " +
          s"fresh within ${staleMs}ms) — concurrent fold/compact refused; " +
          "retry after the holder releases or goes stale")
    }
    if (!tryCreate()) {
      val stale =
        try System.currentTimeMillis() - f.getFileStatus(p).getModificationTime > staleMs
        catch { case _: java.io.FileNotFoundException => true } // released between checks
      if (!stale) refuse()
      // dead holder: break the lease by ATOMIC RENAME to a unique
      // tombstone — of two concurrent breakers only one rename
      // succeeds, and the loser's exclusive create below then refuses;
      // a bare delete here could remove the WINNER's fresh lease
      val tomb = new Path(root,
        s".$LeaseFile.broken.${ProcessHandle.current().pid()}.${System.nanoTime()}")
      val broke =
        try f.rename(p, tomb) catch { case _: java.io.IOException => false }
      if (broke) { try f.delete(tomb, false) catch { case _: java.io.IOException => () } }
      if (!tryCreate()) refuse()
    }
    new Lease(f, p, holder, staleMs)
  }

  /** Run `body` under the writer lease on `root`; release on all exits.
    * The body receives the [[Lease]] so it can [[Lease.ensureHeld]]
    * right before any commit/pointer swap.
    */
  def withLease[A](spark: SparkSession, root: String,
      holder: String = defaultHolder(),
      staleMs: Long = DefaultStaleMs)(body: Lease => A): A = {
    val lease = acquire(spark, root, holder, staleMs)
    try body(lease) finally lease.release()
  }
}
