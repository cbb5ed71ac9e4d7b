package graft

import graft.queries.SessionMemo
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** SessionMemo's concurrency contract: builds are serialized PER
  * SESSION (reentrantly — nested builds like IVF-PQ-invokes-centroids
  * must work), while two different sessions build in PARALLEL — the
  * multi-tenant shape where one session's long Lloyd training must not
  * block another session's unrelated memo. The parallel test is a
  * rendezvous: each session's build waits at a barrier for the other
  * build to arrive, which can only succeed if the two builds are in
  * flight at the same time (under the old single global lock it would
  * time out).
  */
class SessionMemoSpec extends AnyFunSuite with SparkTestBase {

  test("caches per (session, key) and never rebuilds on a hit") {
    val memo = new SessionMemo[String, Integer]
    val builds = new AtomicInteger(0)
    def get() = memo.get(spark, "k") { builds.incrementAndGet(); 42 }
    assert(get() === 42 && get() === 42)
    assert(builds.get() === 1, "second get must be a cache hit")
    // a different session has its own namespace
    val other = spark.newSession()
    assert(memo.get(other, "k") { builds.incrementAndGet(); 7 } === 7)
    assert(builds.get() === 2)
  }

  test("nested builds within one session work (reentrant per-session lock)") {
    val memo = new SessionMemo[String, Integer]
    val v = memo.get(spark, "outer") {
      Integer.valueOf(memo.get(spark, "inner")(Integer.valueOf(1)) + 1)
    }
    assert(v === 2 && memo.get(spark, "inner")(fail("must be cached")) === 1)
  }

  test("two sessions build in parallel; one session's builds serialize") {
    val memo = new SessionMemo[String, Integer]
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    // Both builds must be INSIDE their critical sections simultaneously
    // to pass the barrier; 10 s is far beyond any scheduling jitter, so
    // a timeout means the builds were serialized across sessions.
    val rendezvous = new CyclicBarrier(2)
    val failed = new AtomicInteger(0)
    def worker(s: org.apache.spark.sql.SparkSession) = new Thread(() =>
      try memo.get(s, "k") {
        rendezvous.await(10, TimeUnit.SECONDS); Integer.valueOf(1)
      } catch { case _: Throwable => failed.incrementAndGet(); () })
    val (t1, t2) = (worker(s1), worker(s2))
    t1.start(); t2.start()
    t1.join(15000); t2.join(15000)
    assert(!t1.isAlive && !t2.isAlive, "builds deadlocked or hung")
    assert(failed.get() === 0,
      "cross-session builds timed out at the rendezvous — they were " +
        "serialized by a global lock instead of per-session locks")

    // within ONE session, a second build for a different key must wait
    // for the in-flight build (serialized), and a concurrent get for
    // the SAME key must observe the built value, never run twice.
    val inBuild = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val builds = new AtomicInteger(0)
    val slow = new Thread(() => { memo.get(s1, "slow") {
      builds.incrementAndGet(); inBuild.countDown()
      release.await(10, TimeUnit.SECONDS); Integer.valueOf(9)
    }; () })
    slow.start()
    assert(inBuild.await(10, TimeUnit.SECONDS), "slow build never started")
    val sameKey = new Thread(() => { memo.get(s1, "slow") {
      builds.incrementAndGet(); Integer.valueOf(-1)
    }; () })
    sameKey.start()
    // the same-session racer must be blocked while the build is in
    // flight (per-session serialization), then see the cached 9
    Thread.sleep(200)
    assert(sameKey.isAlive, "same-session get did not wait for the build")
    release.countDown()
    slow.join(15000); sameKey.join(15000)
    assert(builds.get() === 1, "same key built twice within one session")
    assert(memo.get(s1, "slow")(fail("must be cached")) === 9)
  }
}
