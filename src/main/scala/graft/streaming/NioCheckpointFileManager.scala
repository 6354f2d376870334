package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

import java.io.{File, FileNotFoundException, RandomAccessFile}
import java.nio.file.{FileAlreadyExistsException, Files, StandardCopyOption}

/** Checkpoint I/O for streaming state/offset/commit logs over plain
  * `java.nio` when the checkpoint lives on the LOCAL filesystem.
  *
  * Why it exists (measured, OPTIMIZATION_r10.md): without a native
  * Hadoop library, `RawLocalFileSystem` FORKS a shell process for
  * permission work (`chmod` on every created file, `ls -ld` behind
  * `getFileStatus`). A bounded stream-stream join commits 4 state
  * stores × one per shuffle partition per micro-batch, each commit a
  * create+rename+stat — hundreds of forked processes per batch, all
  * funnelled through the global `StateStore.loadedProviders` lock.
  * Stack samples showed 26-29 of 32 task threads blocked there while
  * `Shell.runCommand` ran; the zero-input watermark batch alone cost
  * ~3.5 s. NIO file ops are plain syscalls — no fork, no exec.
  *
  * Scale posture: a production checkpoint lives on HDFS/S3, where this
  * class DELEGATES every call to Spark's own
  * [[FileSystemBasedCheckpointFileManager]] untouched — the class is
  * scheme-dispatched, not a local-only tuning knob. Select it with
  * `spark.sql.streaming.checkpointFileManagerClass`. */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  // file:-scheme checkpoints take the NIO fast path; everything else
  // (hdfs, s3a, ...) delegates to the stock Hadoop-based manager
  private val delegate: Option[CheckpointFileManager] = {
    val scheme = Option(root.toUri.getScheme)
      .getOrElse(org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme)
    if (scheme == null || scheme == "file")
      None
    else
      Some(new org.apache.spark.sql.execution.streaming.checkpointing
        .FileSystemBasedCheckpointFileManager(root, conf))
  }

  private def f(p: Path): File = new File(p.toUri.getPath)

  private def status(file: File): FileStatus = {
    if (!file.exists()) throw new FileNotFoundException(file.toString)
    new FileStatus(file.length(), file.isDirectory, 1, 33554432L,
      file.lastModified(), new Path(file.toURI))
  }

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream =
    delegate match {
      case Some(d) => d.createAtomic(path, overwriteIfPossible)
      case None =>
        val dst = f(path)
        val parent = dst.getParentFile
        if (parent != null && !parent.exists())
          Files.createDirectories(parent.toPath)
        // task-attempt-disambiguated temp name in the same directory so
        // the publish move is atomic on every local filesystem
        val tmp = new File(parent,
          s".${dst.getName}.${java.util.UUID.randomUUID()}.tmp")
        new NioCheckpointFileManager.NioAtomicStream(tmp, dst,
          overwriteIfPossible)
    }

  override def open(path: Path): FSDataInputStream = delegate match {
    case Some(d) => d.open(path)
    case None =>
      val file = f(path)
      if (!file.exists()) throw new FileNotFoundException(file.toString)
      new FSDataInputStream(new NioCheckpointFileManager.RafInput(file))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] =
    delegate match {
      case Some(d) => d.list(path, filter)
      case None =>
        val dir = f(path)
        if (!dir.exists()) throw new FileNotFoundException(dir.toString)
        if (!dir.isDirectory) {
          val st = status(dir)
          if (filter.accept(st.getPath)) Array(st) else Array.empty
        } else {
          val children = dir.listFiles()
          if (children == null) throw new FileNotFoundException(dir.toString)
          children.iterator.map(status)
            .filter(st => filter.accept(st.getPath)).toArray
        }
    }

  override def mkdirs(path: Path): Unit = delegate match {
    case Some(d) => d.mkdirs(path)
    case None => Files.createDirectories(f(path).toPath); ()
  }

  override def exists(path: Path): Boolean = delegate match {
    case Some(d) => d.exists(path)
    case None => f(path).exists()
  }

  override def delete(path: Path): Unit = delegate match {
    case Some(d) => d.delete(path)
    case None =>
      def rm(file: File): Unit = {
        if (file.isDirectory) {
          val children = file.listFiles()
          if (children != null) children.foreach(rm)
        }
        file.delete(); ()
      }
      rm(f(path))
  }

  override def isLocal: Boolean = delegate.forall(_.isLocal)

  override def createCheckpointDirectory(): Path = delegate match {
    case Some(d) => d.createCheckpointDirectory()
    case None =>
      Files.createDirectories(f(root).toPath)
      root
  }
}

object NioCheckpointFileManager {
  /** The session conf that selects this manager. */
  val ConfKey = "spark.sql.streaming.checkpointFileManagerClass"
  val ConfValue = "graft.streaming.NioCheckpointFileManager"

  /** Write-to-temp + atomic-move-on-close stream: the same publish
    * contract as Spark's RenameBasedFSDataOutputStream (sealed, so not
    * extensible from here) — when the final file already exists and
    * overwrite is off, a concurrent committer of the same content won
    * and the temp copy is dropped silently. */
  private final class NioAtomicStream(tmp: File, dst: File,
      overwriteIfPossible: Boolean)
      extends CancellableFSDataOutputStream(
        new java.io.BufferedOutputStream(Files.newOutputStream(tmp.toPath))) {
    private var terminated = false
    override def close(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        underlyingStream.close()
        if (overwriteIfPossible) {
          Files.move(tmp.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          ()
        } else {
          // rename(2) silently replaces, so ATOMIC_MOVE alone cannot give
          // first-committer-wins; a hard link fails atomically when the
          // destination exists (the loser just drops its temp copy)
          try { Files.createLink(dst.toPath, tmp.toPath); () }
          catch { case _: FileAlreadyExistsException => () }
          finally { Files.deleteIfExists(tmp.toPath); () }
        }
      }
    }
    override def cancel(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        try underlyingStream.close()
        finally { Files.deleteIfExists(tmp.toPath); () }
      }
    }
  }

  /** Seekable local-file input without Hadoop filesystem machinery. */
  private final class RafInput(file: File) extends FSInputStream {
    private val raf = new RandomAccessFile(file, "r")
    override def seek(pos: Long): Unit = raf.seek(pos)
    override def getPos: Long = raf.getFilePointer
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = raf.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      raf.read(b, off, len)
    override def available(): Int =
      math.min(Int.MaxValue.toLong, raf.length() - raf.getFilePointer).toInt
    override def close(): Unit = raf.close()
  }
}
