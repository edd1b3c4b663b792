package graft.store

import java.io.{IOException, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** S3A-class OBJECT STORE simulator (scheme `osim://`), backed by
  * local disk — the FileSystem test double the r13 verdict asked for.
  * It models the semantics that differ from a real filesystem, each
  * independently switchable so specs can probe exactly one assumption:
  *
  *  - **PUT-visible-on-close**: every `create` writes to a hidden
  *    staging object; the key appears ATOMICALLY when the stream
  *    closes (multipart-complete semantics). A crashed writer leaves
  *    NOTHING at the key — "torn manifests" are a filesystem
  *    phenomenon that object stores replace with absent objects.
  *  - **[[ObjectStoreSim.conditionalCreate]]** (default true —
  *    S3 If-None-Match / GCS preconditions): `create(overwrite=false)`
  *    arbitrates at CLOSE time under a store-side mutex — exactly one
  *    completer wins the key; losers get a [[FileAlreadyExistsException]]
  *    from `close()`. With the flag OFF the same call degrades to the
  *    plain-S3 danger: an existence CHECK at create time, then an
  *    unconditional last-writer-wins PUT —
  *    [[ObjectStoreSim.betweenCheckAndAct]] lets a spec hold a writer
  *    inside that window deterministically.
  *  - **rename is client-side copy-then-delete** (S3A emulation):
  *    non-atomic, intermediate states observable, a file destination
  *    that already exists fails the rename (S3A contract). Each copied
  *    file is itself a PUT.
  *  - **[[ObjectStoreSim.listingLagMs]]** (default 0 = the strong
  *    listing consistency S3/GCS/ABFS give today): when positive,
  *    `listStatus` hides keys created within the lag window —
  *    legacy-S3 eventual LIST consistency. Per-key GET/HEAD
  *    (`open`/`getFileStatus`) stay consistent, as they were even then.
  *
  * Used by ObjectStoreSemanticsSpec to run the store's arbitration and
  * publish protocols against object-store semantics, and to reproduce
  * on demand the lost-commit clobber that plain (non-conditional) PUT
  * arbitration permits.
  */
object ObjectStoreSim {
  @volatile var conditionalCreate: Boolean = true
  @volatile var listingLagMs: Long = 0L
  /** Which paths the listing lag applies to — lets a spec confine the
    * eventual-consistency probe to the protocol under audit (e.g. only
    * `_commits` listings) while Spark's own data writes, whose
    * FileOutputCommitter lists its freshly written files, stay on
    * strong listings (that committer-on-lagging-LIST problem is the
    * S3A-committer literature, out of scope here — see SURVEY §5).
    */
  @volatile var listingLagPathFilter: String => Boolean = _ => true
  /** Spec hook: runs between the existence check and the PUT of a
    * non-conditional create-no-overwrite — the check-then-act window.
    */
  @volatile var betweenCheckAndAct: Path => Unit = _ => ()

  /** When true, `setTimes` throws UnsupportedOperationException — the
    * real posture of most object-store adapters (S3A et al. have no
    * mutable mtime). Default false: many specs age markers via
    * setTimes; flip it only around the test probing that assumption
    * (the contracts-lock heartbeat fallback, r16 advice #2).
    */
  @volatile var rejectSetTimes: Boolean = false

  /** When a key matches, `open` throws IOException — a transient
    * store-side GET failure, for specs pinning that the read-path
    * fences REFUSE on an unreadable stamp instead of treating the
    * failure as "unchanged" (r17 advice #4).
    */
  @volatile var failOpenPathFilter: String => Boolean = _ => false

  /** key (absolute path string) → epoch millis when it becomes listable. */
  private[store] val visibleAt = new ConcurrentHashMap[String, java.lang.Long]()

  /** Store-side serialization point for conditional-PUT completion. */
  private[store] val putLock = new Object

  def reset(): Unit = {
    conditionalCreate = true
    listingLagMs = 0L
    listingLagPathFilter = _ => true
    betweenCheckAndAct = _ => ()
    rejectSetTimes = false
    failOpenPathFilter = _ => false
    visibleAt.clear()
  }

  private[store] val StagingPrefix = ".osim-put-"

  /** In-flight uploads live here, OUTSIDE any table's keyspace — an
    * object store's multipart staging is not a key (prefix deletes
    * neither list nor kill it). Same mount as /tmp table roots so the
    * completion move stays an atomic rename(2).
    */
  private[store] val stagingRoot: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("osim-staging")
    d.toFile.deleteOnExit()
    d
  }
}

class ObjectStoreSim extends RawLocalFileSystem {
  import ObjectStoreSim._

  override def getUri: URI = URI.create("osim:///")
  override def getScheme: String = "osim"

  private def key(f: Path): String = makeQualified(f).toUri.getPath

  /** The staged upload + atomic completion that every create routes
    * through. `failIfExists`: evaluate the If-None-Match condition at
    * completion (close), under the store's mutex.
    *
    * The staging file lives OUTSIDE the keyspace (a sim-global temp
    * dir): an object store's in-flight multipart upload is not a key,
    * so a concurrent "delete the prefix" must neither kill it nor see
    * it — whereas staging inside the destination's parent made an
    * in-flight PUT die with ENOENT when a racing same-version writer
    * recursively deleted that "directory" (a local-FS artifact; keys
    * need no parents). Completion re-materializes the parent path the
    * local backing requires and retries the move briefly against a
    * still-racing recursive delete — on a real store the PUT would
    * simply land.
    */
  private def putStream(f: Path, permission: FsPermission, bufferSize: Int,
                        replication: Short, blockSize: Long,
                        progress: Progressable,
                        failIfExists: Boolean): FSDataOutputStream = {
    val staged = ObjectStoreSim.stagingRoot.resolve(
      StagingPrefix + f.getName + "-" + java.util.UUID.randomUUID().toString.take(8))
    val inner = super.create(new Path(staged.toString), permission, true,
      bufferSize, replication, blockSize, progress)
    val commit: () => Unit = () => {
      val dst = java.nio.file.Paths.get(key(f))
      putLock.synchronized {
        if (failIfExists && java.nio.file.Files.exists(dst)) {
          java.nio.file.Files.deleteIfExists(staged)
          throw new FileAlreadyExistsException(
            s"PUT of $f failed its if-none-match precondition")
        }
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          java.nio.file.Files.createDirectories(dst.getParent)
          try {
            java.nio.file.Files.move(staged, dst,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            done = true
          } catch {
            case e: java.nio.file.NoSuchFileException =>
              // a racing recursive delete tore the just-made parent
              // out again — keys have no parents on a real store, so
              // the PUT must still land; retry briefly
              if (attempts >= 5) throw e
          }
        }
      }
      if (listingLagMs > 0)
        visibleAt.put(key(f), System.currentTimeMillis() + listingLagMs): Unit
    }
    new FSDataOutputStream(new CommitOnClose(inner, commit), null)
  }

  private def superExists(p: Path): Boolean =
    try { super.getFileStatus(p); true }
    catch { case _: IOException => false }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (overwrite)
      putStream(f, permission, bufferSize, replication, blockSize, progress,
        failIfExists = false)
    else if (conditionalCreate) {
      // early HEAD is allowed (and what real clients do) — the real
      // arbitration still happens at completion under the store mutex
      if (superExists(f)) throw new FileAlreadyExistsException(f.toString)
      putStream(f, permission, bufferSize, replication, blockSize, progress,
        failIfExists = true)
    } else {
      // plain S3: "no overwrite" is only a client-side CHECK before an
      // unconditional PUT — the exact check-then-act the manifest
      // arbiter must not be built on
      if (superExists(f)) throw new FileAlreadyExistsException(f.toString)
      betweenCheckAndAct(f)
      putStream(f, permission, bufferSize, replication, blockSize, progress,
        failIfExists = false)
    }
  }

  // RawLocalFileSystem SHORT-CIRCUITS these overloads past the 7-arg
  // permission variant (it opens the real file directly) — every one
  // must be re-routed or a caller taking that path would get POSIX
  // in-place-truncate semantics and silently skip the PUT staging.
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    create(f, FsPermission.getFileDefault, overwrite, bufferSize,
      replication, blockSize, progress)

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  overwrite: Boolean, bufferSize: Int,
                                  replication: Short, blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    create(f, permission, overwrite, bufferSize, replication, blockSize, progress)

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                                  bufferSize: Int, replication: Short,
                                  blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    create(f, permission,
      flags.contains(org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      bufferSize, replication, blockSize, progress)

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new IOException("osim: object stores do not append")

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (failOpenPathFilter(key(f)))
      throw new IOException(s"osim: injected transient GET failure for $f")
    super.open(f, bufferSize)
  }

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    if (rejectSetTimes)
      throw new UnsupportedOperationException(
        "osim: object keys have no mutable mtime")
    else super.setTimes(p, mtime, atime)

  /** S3A-style rename: recursive client-side copy, then delete the
    * source — NOT atomic; a reader can observe any prefix of the copy,
    * and a crash strands it. Returns false onto an existing file
    * destination or a missing source (S3A contract).
    */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!superExists(src)) return false
    val dstStatus = if (superExists(dst)) Some(super.getFileStatus(dst)) else None
    val target = dstStatus match {
      case Some(st) if st.isDirectory => new Path(dst, src.getName)
      case Some(_) => return false
      case None => dst
    }
    if (superExists(target) && super.getFileStatus(target).isFile) return false
    FileUtil.copy(this, src, this, target, false, true, getConf) &&
      delete(src, true)
  }

  /** LIST with optional legacy eventual consistency: keys younger than
    * the lag window are invisible; staging objects never list.
    */
  override def listStatus(f: Path): Array[FileStatus] = {
    val now = System.currentTimeMillis()
    super.listStatus(f).filter { st =>
      val n = st.getPath.getName
      !n.startsWith(StagingPrefix) && {
        listingLagMs <= 0 || !listingLagPathFilter(key(st.getPath)) || {
          val vis = visibleAt.get(key(st.getPath))
          vis == null || vis <= now
        }
      }
    }
  }

  /** Per-key GET/HEAD stays consistent (read-after-write held even on
    * legacy S3 for first-time keys) — but staging objects are
    * internal to the store and must not answer for their target key.
    */
  override def getFileStatus(f: Path): FileStatus = {
    if (f.getName.startsWith(StagingPrefix))
      throw new java.io.FileNotFoundException(f.toString)
    super.getFileStatus(f)
  }
}

/** Delegates writes; runs `commit` after the inner stream closes —
  * the "multipart complete" step that makes the key visible (or fails
  * the conditional PUT).
  */
private[store] class CommitOnClose(inner: OutputStream, commit: () => Unit)
    extends OutputStream {
  private var closed = false
  override def write(b: Int): Unit = inner.write(b)
  override def write(b: Array[Byte], off: Int, len: Int): Unit =
    inner.write(b, off, len)
  override def flush(): Unit = inner.flush()
  override def close(): Unit =
    if (!closed) { closed = true; inner.close(); commit() }
}
