package graft.lock

import java.io.RandomAccessFile
import java.nio.channels.FileLock
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

/** Whole-database advisory locking — mirrors the reference's
  * `FileLock`/`FakeLock` (`/root/reference/src/aerovaldb/lock/
  * lock.py:55-108`): an exclusive OS file lock on a lock file named
  * `md5(basedir)` under `~/.aerovaldbspark/lock/` (override with
  * `AVDB_LOCK_DIR`), plus a JVM-level lock for in-process coordination
  * (OS file locks are per-process). Enabled via `AVDB_USE_LOCKING`;
  * default is the no-op lock.
  */
trait AdvisoryLock extends AutoCloseable {
  def acquire(): Unit
  def release(): Unit
  def isLocked: Boolean
  override def close(): Unit = release()
}

/** Default no-op lock (`lock.py:55-76`). */
final class FakeLock extends AdvisoryLock {
  @volatile private var held = true // mirrors reference: starts acquired
  def acquire(): Unit = { held = true }
  def release(): Unit = { held = false }
  def isLocked: Boolean = held
}

/** Exclusive advisory lock on `lockFile`. Blocks on acquire. */
final class FileAdvisoryLock(lockFile: Path) extends AdvisoryLock {
  Files.createDirectories(lockFile.getParent)
  private val raf = new RandomAccessFile(lockFile.toFile, "rw")
  // JVM-wide monitor per canonical lock path: FileChannel locks are
  // held per-process, so in-process writers must serialize separately.
  private val monitor = FileAdvisoryLock.monitorFor(lockFile.toString)
  private var osLock: Option[FileLock] = None
  acquire()

  def acquire(): Unit = synchronized {
    if (osLock.isEmpty) {
      monitor.acquireUninterruptibly()
      osLock = Some(raf.getChannel.lock())
    }
  }

  def release(): Unit = synchronized {
    osLock.foreach { l => l.release(); monitor.release() }
    osLock = None
  }

  def isLocked: Boolean = synchronized(osLock.isDefined)

  override def close(): Unit = { release(); raf.close() }
}

object FileAdvisoryLock {
  // Semaphore(1), not ReentrantLock: the reference's lock has no thread
  // ownership — release() from a thread other than the acquirer must
  // work (ReentrantLock.unlock would throw IllegalMonitorStateException
  // there). Fair, so in-process waiters are FIFO like the OS queue.
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Semaphore]()
  private def monitorFor(key: String) =
    monitors.computeIfAbsent(key, _ => new java.util.concurrent.Semaphore(1, true))
}

object Locking {
  /** `str_to_bool` env parse (`string_utils.py:6-43`). */
  def strToBool(s: String, default: Boolean = false): Boolean =
    s.trim.toLowerCase match {
      case ""                          => default
      case "1" | "true" | "t" | "yes" | "y" => true
      case "0" | "false" | "f" | "no" | "n" => false
      case other => throw new IllegalArgumentException(s"Cannot parse '$other' as bool")
    }

  def lockingEnabled: Boolean =
    strToBool(sys.env.getOrElse("AVDB_USE_LOCKING", ""), default = false)

  def lockDir: Path =
    sys.env.get("AVDB_LOCK_DIR").map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("user.home"), ".aerovaldbspark", "lock"))

  /** Lock file path for a database root: `md5(basedir)` under lockDir
    * (`jsonfiledb.py:696-702`). */
  def lockFileFor(basedir: String): Path = {
    val md5 = MessageDigest.getInstance("MD5").digest(basedir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    lockDir.resolve(md5)
  }

  /** Real lock when enabled, else the no-op lock. */
  def forBasedir(basedir: String): AdvisoryLock =
    if (lockingEnabled) new FileAdvisoryLock(lockFileFor(basedir)) else new FakeLock
}
