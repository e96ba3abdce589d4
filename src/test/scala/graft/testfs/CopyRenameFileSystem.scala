package graft.testfs

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileUtil, Path, RawLocalFileSystem}

/** A local FileSystem whose `rename` is COPY + DELETE — the
  * object-store behavior StoreGen's protocol argument cites
  * (StoreGen.scala:9-22, the S3A caveat): renames are data-sized and
  * NON-atomic, with a window where source and destination coexist,
  * and (through the FileContext OVERWRITE path, which deletes the
  * destination before delegating here) a window where the destination
  * does not exist at all. StoreGenHostileFsSpec runs the full
  * generation protocol — Spark job commits included — against this to
  * prove nothing secretly leans on POSIX atomic rename.
  */
class CopyRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "copydel"
  override def getUri: URI = URI.create("copydel:///")

  override def rename(src: Path, dst: Path): Boolean = {
    CopyRenameFileSystem.renames.incrementAndGet()
    // dst-is-existing-directory moves src INTO it (standard Hadoop FS
    // contract, which the FileOutputCommitter merge relies on)
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory) new Path(dst, src.getName)
      else dst
    if (!exists(src) || exists(target)) false
    else FileUtil.copy(this, src, this, target, /* deleteSource = */ true, getConf)
  }
}

object CopyRenameFileSystem {
  /** Proof the shim actually intercepted the protocol's renames. */
  val renames = new AtomicInteger(0)

  val Scheme = "copydel"

  /** Register the shim (FileSystem + AbstractFileSystem sides) on a
    * Hadoop configuration — covers both `FileSystem.get` callers and
    * StoreGen.commit's `FileContext` pointer swap.
    */
  def register(conf: Configuration): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[CopyRenameFileSystem].getName)
    conf.set(s"fs.AbstractFileSystem.$Scheme.impl",
      classOf[CopyRenameAbstractFs].getName)
  }
}

/** FileContext adapter: AbstractFileSystem.renameInternal(src, dst,
  * OVERWRITE) deletes an existing destination and then delegates to
  * [[CopyRenameFileSystem.rename]] — exactly the non-atomic
  * delete→copy→delete sequence an object store's "rename" performs.
  */
class CopyRenameAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new CopyRenameFileSystem, conf, CopyRenameFileSystem.Scheme, false)
