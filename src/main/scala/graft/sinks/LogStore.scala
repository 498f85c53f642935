package graft.sinks

import java.io.{File, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Storage abstraction for the SnapshotStore METADATA layer (r18) —
  * manifests, the `_latest` pointer, the writer lock, and every
  * sidecar (schema / colmap / stats header / batch / constraints /
  * consumer cursors). Data files and parquet checkpoints move through
  * Spark's own readers/writers (any Hadoop FileSystem already); this
  * trait is what previously pinned the metadata to POSIX `java.io
  * .File` + NIO `ATOMIC_MOVE`, which do not exist on `s3://`/`hdfs://`
  * table roots — the public Delta LogStore design, single-writer
  * variant.
  *
  * CONTRACTS the table layer depends on:
  *  - [[writeAtomic]]: the target is visible either with its complete
  *    old content or its complete new content, NEVER partial —
  *    existence implies completeness (the heal rule reads this).
  *    Implementations use write-tmp + atomic rename where the FS
  *    provides one (POSIX, HDFS), or a direct single-object PUT where
  *    object-store visibility is already all-or-nothing (S3-style —
  *    a PUT is never observed partially).
  *  - [[putIfAbsent]]: succeed for exactly one concurrent caller —
  *    the writer-lock primitive. POSIX O_EXCL and HDFS
  *    create-no-overwrite are atomic; plain object stores are
  *    check-then-put and therefore SINGLE-WRITER-per-table unless the
  *    store offers a conditional put (S3 If-None-Match) or external
  *    coordination — the same documented restriction as Delta's
  *    S3SingleDriverLogStore.
  *  - [[rename]] MAY be unsupported (return false / throw): callers
  *    in the table layer must either not need it or have a heal path
  *    (the DV-GC swap degrades to copy+delete via [[copyFile]]).
  *
  * Paths are plain strings (scheme-qualified or local); [[LogStore
  * .forPath]] picks the implementation by scheme, with a test seam to
  * force one. */
trait LogStore {

  /** Full content of a (small) metadata file. */
  def readString(path: String): String

  /** Streaming read — header probes of big manifests read a few bytes,
    * never the body. Caller closes. */
  def open(path: String): InputStream

  /** All-or-nothing publish; overwrites. See the trait contract. */
  def writeAtomic(path: String, content: String): Unit

  /** Create `path` exclusively (the lock primitive); true iff this
    * caller created it. */
  def putIfAbsent(path: String, content: String = ""): Boolean

  def exists(path: String): Boolean

  /** Delete a file (false if absent). Directories need
    * [[deleteRecursively]]. */
  def delete(path: String): Boolean

  def deleteRecursively(path: String): Unit

  def mkdirs(path: String): Unit

  /** Children of a directory: (full path, name, isDirectory). Empty
    * for a missing dir. */
  def list(dir: String): Seq[LogStore.Entry]

  def length(path: String): Long

  def lastModified(path: String): Long

  /** Atomic rename where the FS supports one; false on failure. Object
    * stores may not support it at all — callers must have a copy-based
    * fallback. */
  def rename(src: String, dst: String): Boolean

  /** Whether [[rename]] is a real atomic primitive here. */
  def renameSupported: Boolean

  /** Copy one file's bytes (replace if present). */
  def copyFile(src: String, dst: String): Unit

  /** Join a child name onto a directory path. */
  def child(dir: String, name: String): String =
    dir.stripSuffix("/") + "/" + name
}

object LogStore {

  final case class Entry(path: String, name: String, isDir: Boolean)

  /** Test seam: force every table root through one store (used to run
    * the full table-layer suite against object-store semantics — no
    * rename primitive — without standing up a remote FS). */
  @volatile var overrideStore: Option[LogStore] = None

  /** Store for a table root: the local POSIX store for plain paths,
    * the Hadoop-FileSystem store for scheme-qualified ones. */
  def forPath(path: String): LogStore =
    overrideStore.getOrElse {
      if (path.contains("://") || path.startsWith("file:"))
        HadoopLogStore.forPath(path)
      else LocalLogStore
    }
}

/** POSIX implementation — the store every local table root used before
  * the abstraction existed; behavior-identical (NIO ATOMIC_MOVE
  * publishes, O_EXCL locks). */
object LocalLogStore extends LogStore {

  override def readString(path: String): String =
    new String(Files.readAllBytes(new File(path).toPath),
      StandardCharsets.UTF_8)

  override def open(path: String): InputStream =
    new java.io.FileInputStream(path)

  override def writeAtomic(path: String, content: String): Unit = {
    val target = new File(path)
    target.getParentFile.mkdirs()
    val tmp = new File(target.getParentFile, target.getName + ".tmp")
    Files.write(tmp.toPath, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, target.toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def putIfAbsent(path: String, content: String): Boolean = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val created = f.createNewFile()
    if (created && content.nonEmpty)
      Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    created
  }

  override def exists(path: String): Boolean = new File(path).exists()

  override def delete(path: String): Boolean = new File(path).delete()

  override def deleteRecursively(path: String): Unit = {
    def go(f: File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.foreach(go)
      f.delete(): Unit
    }
    val f = new File(path)
    if (f.exists()) go(f)
  }

  override def mkdirs(path: String): Unit = { new File(path).mkdirs(): Unit }

  override def list(dir: String): Seq[LogStore.Entry] =
    Option(new File(dir).listFiles()).toSeq.flatten
      .map(f => LogStore.Entry(f.getPath, f.getName, f.isDirectory))

  override def length(path: String): Long = new File(path).length()

  override def lastModified(path: String): Long =
    new File(path).lastModified()

  override def rename(src: String, dst: String): Boolean =
    new File(src).renameTo(new File(dst))

  override def renameSupported: Boolean = true

  override def copyFile(src: String, dst: String): Unit = {
    Files.copy(new File(src).toPath, new File(dst).toPath,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }
}

/** Hadoop-FileSystem implementation — `hdfs://`, `file:`, `s3a://`,
  * or any registered scheme. Atomic-publish strategy follows the
  * public Delta LogStore split:
  *  - rename-capable FS (HDFS, local): write `.tmp` + FileContext
  *    rename with OVERWRITE — atomic on HDFS, so concurrent readers
  *    see old-or-new;
  *  - object stores (no atomic rename): a direct create-overwrite —
  *    an object PUT is all-or-nothing visible, which satisfies the
  *    [[LogStore.writeAtomic]] contract on its own; [[putIfAbsent]]
  *    is check-then-put there, so multi-writer safety needs a
  *    conditional-put capable store or external coordination
  *    (single-writer-per-table otherwise — documented above).
  * Scheme → strategy is auto-detected and overridable. */
class HadoopLogStore(conf: org.apache.hadoop.conf.Configuration,
                     val renameSupported: Boolean) extends LogStore {

  import org.apache.hadoop.fs.{FileSystem, Path}

  private def fs(p: String): FileSystem = new Path(p).getFileSystem(conf)

  override def readString(path: String): String = {
    val in = open(path)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  override def open(path: String): InputStream =
    fs(path).open(new Path(path))

  override def writeAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val f = fs(path)
    if (renameSupported) {
      val tmp = new Path(p.getParent, p.getName + ".tmp")
      val out = f.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // FileContext rename+OVERWRITE is the atomic primitive HDFS
      // guarantees (plain FileSystem.rename refuses an existing dest)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } else {
      // object-store PUT: all-or-nothing visibility by the store itself
      val out = f.create(p, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  override def putIfAbsent(path: String, content: String): Boolean = {
    val p = new Path(path)
    val f = fs(path)
    try {
      val out = f.create(p, false) // no-overwrite create
      try { if (content.nonEmpty) out.write(content.getBytes(StandardCharsets.UTF_8)) }
      finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.FileNotFoundException => false
      case e: java.io.IOException
          if e.getMessage != null && e.getMessage.contains("exists") => false
    }
  }

  override def exists(path: String): Boolean =
    fs(path).exists(new Path(path))

  override def delete(path: String): Boolean =
    try fs(path).delete(new Path(path), false)
    catch { case _: java.io.IOException => false }

  override def deleteRecursively(path: String): Unit = {
    val f = fs(path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true): Unit }
  }

  override def mkdirs(path: String): Unit = {
    fs(path).mkdirs(new Path(path)): Unit
  }

  override def list(dir: String): Seq[LogStore.Entry] = {
    val f = fs(dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map { st =>
      LogStore.Entry(st.getPath.toString, st.getPath.getName, st.isDirectory)
    }
  }

  override def length(path: String): Long =
    fs(path).getFileStatus(new Path(path)).getLen

  override def lastModified(path: String): Long =
    fs(path).getFileStatus(new Path(path)).getModificationTime

  override def rename(src: String, dst: String): Boolean =
    renameSupported && fs(src).rename(new Path(src), new Path(dst))

  override def copyFile(src: String, dst: String): Unit = {
    val in = open(src)
    try {
      val out = fs(dst).create(new Path(dst), true)
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
  }

  override def child(dir: String, name: String): String =
    new org.apache.hadoop.fs.Path(dir, name).toString
}

object HadoopLogStore {

  /** Schemes with a real atomic rename. Everything else is treated as
    * an object store (PUT-visibility publishes, check-then-put
    * locks). */
  private val renameCapable = Set("hdfs", "file", "viewfs", "")

  def forPath(path: String): HadoopLogStore = {
    val scheme = Option(java.net.URI.create(path).getScheme).getOrElse("")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    new HadoopLogStore(conf, renameCapable(scheme))
  }
}
