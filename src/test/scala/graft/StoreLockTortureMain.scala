package graft

import java.nio.file.{Files, Paths}

import graft.sources.StoreLock

/** Crash/race-torture driver for [[graft.sources.StoreLock]] —
  * deliberately Spark-free (the lock is put-if-absent on the
  * [[graft.state.TxnLog.ObjectStore]] seam), so a spec can spawn several
  * as REAL processes and `kill -9` them mid-claim, the same honesty
  * argument as [[TxnTortureMain]].
  *
  * Usage:
  *  - `StoreLockTortureMain <dir> <iters>` — loop `iters` times:
  *    claim `<dir>/store`, then perform a deliberately NON-ATOMIC
  *    read-modify-write of `<dir>/counter` (read, yield, write n+1).
  *    Only the lock's mutual exclusion keeps the counter equal to the
  *    total iteration count across processes — any interleaving loses
  *    increments, which is exactly what the spec asserts never happens.
  *  - `StoreLockTortureMain <dir> hold` — claim the store and sleep
  *    (the kill -9 target: a forcibly-killed holder must leave a stale
  *    claim the next writer refuses on loudly until forceBreak).
  */
object StoreLockTortureMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val store = dir + "/store"
    if (args(1) == "hold") {
      StoreLock.withLock(store, "torture-hold") {
        // visible signal that the claim is held, then park until killed
        Files.write(Paths.get(dir, "holding"), Array.emptyByteArray)
        Thread.sleep(600000)
      }
    } else {
      val iters = args(1).toInt
      val counter = Paths.get(dir, "counter")
      // contend hard: wait generously so both processes run to completion
      System.setProperty("graft.store.lock.waitMs", "120000")
      var i = 0
      while (i < iters) {
        StoreLock.withLock(store, "torture-rmw") {
          val n = if (Files.exists(counter))
            new String(Files.readAllBytes(counter), "UTF-8").trim.toLong
          else 0L
          Thread.`yield`() // widen the lost-update window
          Files.write(counter, (n + 1).toString.getBytes("UTF-8"))
        }
        i += 1
      }
    }
  }
}
