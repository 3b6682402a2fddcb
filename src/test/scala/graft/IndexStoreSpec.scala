package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IndexStore

/** Lock protocol of [[IndexStore.buildOnce]] (ADVICE r3): liveness is the
  * lock's heartbeated mtime, takeover re-acquires the lock, and no path
  * builds lock-free.
  */
class IndexStoreSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("idxstore").resolve("layout").toString

  private def markReady(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "_GRAFT_READY"), "ok")
    ()
  }

  test("builds once, clears the lock, later calls are no-ops") {
    val dir = tmpDir()
    val n = new AtomicInteger(0)
    IndexStore.buildOnce(dir) { n.incrementAndGet(); markReady(dir) }
    IndexStore.buildOnce(dir) { n.incrementAndGet(); markReady(dir) }
    assert(n.get() == 1)
    assert(!Files.exists(Paths.get(s"$dir.lock")))
  }

  test("stale lock (dead builder) is taken over via re-acquire") {
    val dir = tmpDir()
    val lock = Paths.get(s"$dir.lock")
    Files.createDirectories(lock)
    Files.writeString(lock.resolve("owner"), "dead-builder")
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - 60000L))
    val n = new AtomicInteger(0)
    IndexStore.buildOnce(dir, staleMs = 500L) { n.incrementAndGet(); markReady(dir) }
    assert(n.get() == 1)
    assert(!Files.exists(lock)) // takeover cleaned its own lock on release
  }

  test("live builder is never raced: heartbeat keeps the lock fresh") {
    val dir = tmpDir()
    val n = new AtomicInteger(0)
    // builder takes ~1.2s; staleMs=400 means a FIXED-wait waiter (the old
    // bug) would have declared it dead and double-built — the heartbeat
    // (staleMs/4 = 100ms cadence) must prevent that
    val builder = new Thread(() =>
      IndexStore.buildOnce(dir, staleMs = 400L) {
        Thread.sleep(1200); n.incrementAndGet(); markReady(dir)
      })
    builder.start()
    Thread.sleep(150) // let the builder acquire
    IndexStore.buildOnce(dir, staleMs = 400L) { n.incrementAndGet(); markReady(dir) }
    builder.join(10000)
    assert(n.get() == 1)
    assert(Files.exists(Paths.get(dir, "_GRAFT_READY")))
  }

  test("cold-start race: exactly one of N concurrent callers builds") {
    val dir = tmpDir()
    val n = new AtomicInteger(0)
    val threads = (1 to 4).map(_ => new Thread(() =>
      IndexStore.buildOnce(dir, staleMs = 5000L) {
        Thread.sleep(100); n.incrementAndGet(); markReady(dir)
      }))
    threads.foreach(_.start())
    threads.foreach(_.join(10000))
    assert(n.get() == 1)
    assert(!Files.exists(Paths.get(s"$dir.lock")))
  }
}
