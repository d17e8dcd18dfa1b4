package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TmpStores

/** The buildOnce memo's three load-bearing properties (each one keeps the
  * bench honest: a rebuild would re-charge store writes to probe timings,
  * a memoized failure would serve a half-written store forever, and a
  * concurrent double-build would race overwrite-vs-read on one dir), plus
  * the scoping contract scopedPath's docstring states. */
class TmpStoresSpec extends AnyFunSuite {

  private def freshPath(tag: String): String =
    TmpStores.scopedPath(s"graft-tmpstores-spec-$tag",
      s"$tag-${System.nanoTime()}")

  test("second call reuses the store: build runs once, files untouched") {
    val path = freshPath("reuse")
    val builds = new AtomicInteger(0)
    def build(): Unit = {
      builds.incrementAndGet()
      Files.createDirectories(Paths.get(path))
      Files.write(Paths.get(path, "part-0"), "store".getBytes("UTF-8"))
    }
    TmpStores.buildOnce(path)(build())
    val mtime = Files.getLastModifiedTime(Paths.get(path, "part-0"))
    TmpStores.buildOnce(path)(build())
    assert(builds.get() == 1, "second buildOnce must not re-run the build")
    assert(Files.getLastModifiedTime(Paths.get(path, "part-0")) == mtime,
      "second buildOnce must not rewrite store files")
  }

  test("a throwing build is not memoized: the next caller retries") {
    val path = freshPath("retry")
    val attempts = new AtomicInteger(0)
    val boom = intercept[RuntimeException] {
      TmpStores.buildOnce(path) {
        attempts.incrementAndGet()
        sys.error("simulated mid-build crash")
      }
    }
    assert(boom.getMessage.contains("simulated mid-build crash"))
    TmpStores.buildOnce(path) {
      attempts.incrementAndGet()
      Files.createDirectories(Paths.get(path))
    }
    assert(attempts.get() == 2, "a failed build must be retried, not memoized")
    // and now the memo holds: a third call is a no-op
    TmpStores.buildOnce(path)(attempts.incrementAndGet())
    assert(attempts.get() == 2)
  }

  test("concurrent callers for one path run the build exactly once") {
    val path = freshPath("conc")
    val builds = new AtomicInteger(0)
    val started = new CountDownLatch(1)
    val threads = 8
    val pool = Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            started.await()
            TmpStores.buildOnce(path) {
              builds.incrementAndGet()
              Thread.sleep(50) // widen the race window
              Files.createDirectories(Paths.get(path))
              Files.write(Paths.get(path, "part-0"), "x".getBytes("UTF-8"))
            }
            // every caller returns only after the store is complete
            assert(Files.exists(Paths.get(path, "part-0")),
              "a buildOnce caller returned before the store landed")
          }
        })
      }
      started.countDown()
      futures.foreach(_.get(30, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(builds.get() == 1,
      s"concurrent callers must build once, built ${builds.get()} times")
  }

  test("scopedPath: path identity is KEY identity (not dataset content)") {
    val a1 = TmpStores.scopedPath("graft-tmpstores-spec", "keyA")
    val a2 = TmpStores.scopedPath("graft-tmpstores-spec", "keyA")
    val b = TmpStores.scopedPath("graft-tmpstores-spec", "keyB")
    assert(a1 == a2, "one key must map to one store path within a JVM")
    assert(a1 != b, "distinct keys must not collide")
    assert(a1.contains(s"p${ProcessHandle.current().pid()}"),
      "paths must be pid-scoped so concurrent drivers never share a store")
    // The documented caveat, pinned: the key is the dataset dir PATH, so
    // the memo CANNOT see a dataset rewritten in-place within one JVM —
    // callers rely on dataset dirs being immutable for the JVM lifetime.
    val builds = new AtomicInteger(0)
    TmpStores.buildOnce(a1)(builds.incrementAndGet())
    TmpStores.buildOnce(a2)(builds.incrementAndGet()) // same key, "new" data
    assert(builds.get() == 1,
      "same key reuses the store even if the dataset dir were rewritten " +
        "(the documented immutable-dataset-dir assumption)")
  }
}
