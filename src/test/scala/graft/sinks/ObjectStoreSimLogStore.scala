package graft.sinks

import java.io.{File, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Test double simulating OBJECT-STORE metadata semantics over local
  * disk: NO rename primitive exists (any call throws — proving the
  * table layer never depends on one), publishes are direct
  * whole-object writes (a real store's PUT is all-or-nothing
  * visible), and the lock is an exclusive create (the
  * conditional-put / single-writer discipline). Running the full
  * torture walk through this store is the r18 gate for "the metadata
  * layer works on a non-POSIX-semantics root". */
object ObjectStoreSimLogStore extends LogStore {

  override def readString(path: String): String =
    new String(Files.readAllBytes(new File(path).toPath),
      StandardCharsets.UTF_8)

  override def open(path: String): InputStream =
    new java.io.FileInputStream(path)

  /** Direct PUT — no tmp file, no rename. (On local disk this is not
    * truly atomic; the SIMULATION asserts only that no rename is
    * needed, which is the property object stores lack.) */
  override def writeAtomic(path: String, content: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8)): Unit
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
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(go)
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
    throw new UnsupportedOperationException(
      s"object store: no rename primitive ($src -> $dst) - the table " +
        "layer must not reach this on a renameSupported=false store")

  override def renameSupported: Boolean = false

  override def copyFile(src: String, dst: String): Unit = {
    Files.copy(new File(src).toPath, new File(dst).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }
}
