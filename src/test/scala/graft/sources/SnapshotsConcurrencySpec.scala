package graft.sources

import graft.SpecBase
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** Multi-writer optimistic concurrency (SURVEY §1.1's last data-model
  * gap): two genuinely interleaved writers must either serialize
  * (appends; disjoint deletes) or abort loudly (overlapping stale
  * deletes) — never lose a commit, never surface partial data. */
class SnapshotsConcurrencySpec extends SpecBase {
  import spark.implicits._

  private def freshPath(): String =
    Files.createTempDirectory("graft_snap_oc").resolve("t").toString

  test("two interleaved optimistic appenders both commit; result is serial") {
    val path = freshPath()
    Snapshots.append(Seq(0).toDF("x"), path) // seed snap=1
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Snapshots.OptimisticCommit]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try {
          start.await()
          results.add(Snapshots.appendOptimistic(
            Seq(i * 10, i * 10 + 1).toDF("x"), path))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"no appender may fail: ${errs.toArray.toSeq}")
    val ids = results.toArray(Array.empty[Snapshots.OptimisticCommit])
      .map(_.id).sorted.toSeq
    // every writer got its own sequential id — no lost or duplicate
    // commit regardless of interleaving
    assert(ids == Seq(2L, 3L, 4L, 5L), s"ids were $ids")
    assert(Snapshots.committed(spark, path) == Seq(1L, 2L, 3L, 4L, 5L))
    val got = Snapshots.read(spark, path).as[Int].collect().sorted.toSeq
    assert(got == Seq(0, 10, 11, 20, 21, 30, 31, 40, 41),
      "union of all appends == any serial order of commuting appends")
    // the lock was released by everyone: a plain append still works
    Snapshots.append(Seq(99).toDF("x"), path)
  }

  test("overlapping stale deletes: first commits, second aborts loudly") {
    val path = freshPath()
    Snapshots.upsert((1 to 8).map(k => (k.toLong, s"v$k"))
      .toDF("k", "v"), path)
    val basedOn = Snapshots.head(spark, path).get
    // writer A deletes {5} against head; commits
    val a = Snapshots.deleteOptimistic(
      Seq(5L).toDF("k"), path, "k", basedOn)
    assert(a.id == 2L)
    // writer B also decided to delete {5, 6} against the SAME stale
    // head — overlap on 5 must abort, not last-writer-win
    val e = intercept[Snapshots.ConflictException] {
      Snapshots.deleteOptimistic(Seq(5L, 6L).toDF("k"), path, "k", basedOn)
    }
    assert(e.getMessage.contains("5") &&
      e.getMessage.contains(s"based on snapshot $basedOn"))
    // the abort left no trace: log unchanged, key 6 still live, the
    // staged dir cleaned, and the abort counted
    assert(Snapshots.committed(spark, path) == Seq(1L, 2L))
    val live = Snapshots.readMerged(spark, path, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(live == Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L))
    val (_, aborts) = Snapshots.ocStats(spark, path)
    assert(aborts == 1L)
    // a DISJOINT delete against the same stale head commutes: commits
    val c = Snapshots.deleteOptimistic(Seq(7L).toDF("k"), path, "k", basedOn)
    assert(c.id == 3L)
    val live2 = Snapshots.readMerged(spark, path, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(live2 == Seq(1L, 2L, 3L, 4L, 6L, 8L))
  }

  test("interleaved delete vs append: appends never conflict") {
    val path = freshPath()
    Snapshots.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val basedOn = Snapshots.head(spark, path).get
    // an append lands between the delete's read and its commit
    Snapshots.appendOptimistic(Seq((3L, "c", false))
      .toDF("k", "v", "_tombstone"), path)
    // the delete still commits: the interleaved batch tombstoned
    // nothing it touches (k=1), so the histories serialize
    val d = Snapshots.deleteOptimistic(Seq(1L).toDF("k"), path, "k", basedOn)
    assert(d.id == 3L)
    val live = Snapshots.readMerged(spark, path, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(live == Seq(2L, 3L))
  }

  test("stale delete vs concurrent UPSERT of the same key aborts") {
    // the delete-vs-upsert write-write conflict: a key re-written
    // after basedOn must not be silently erased by a younger
    // tombstone whose writer never saw the new row (the round-17
    // advice finding — conflict checks used to see only tombstones)
    val path = freshPath()
    Snapshots.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val basedOn = Snapshots.head(spark, path).get
    // concurrent writer re-upserts k=1 (new value) after basedOn
    Snapshots.appendOptimistic(Seq((1L, "a2")).toDF("k", "v"), path)
    val e = intercept[Snapshots.ConflictException] {
      Snapshots.deleteOptimistic(Seq(1L).toDF("k"), path, "k", basedOn)
    }
    assert(e.getMessage.contains("tombstone or upsert"))
    // the upserted row survived; the abort counted; log unchanged
    val live = Snapshots.readMerged(spark, path, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(live.toSeq == Seq((1L, "a2"), (2L, "b")))
    assert(Snapshots.ocStats(spark, path)._2 == 1L)
    assert(Snapshots.committed(spark, path) == Seq(1L, 2L))
    // re-decided against the new head, the delete commits
    val head2 = Snapshots.head(spark, path).get
    Snapshots.deleteOptimistic(Seq(1L).toDF("k"), path, "k", head2)
    assert(Snapshots.readMerged(spark, path, "k")
      .select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("large delete batch: conflict check pre-runs unlocked, appenders interleave") {
    // the round-17 advice: the overlap check (a Spark join) must not
    // sit inside the commit lock for the whole batch — phase 1 runs
    // unlocked, the locked phase re-validates only commits that
    // appeared since. Proof by interleaving: a LARGE delete and four
    // tight-budget appenders all succeed concurrently; under the old
    // single-phase layout the appenders' 3 s budgets would be eaten
    // whenever the big check held the lock.
    val path = freshPath()
    Snapshots.upsert((1L to 200000L).map(k => (k, s"v$k"))
      .toDF("k", "v"), path)
    val basedOn = Snapshots.head(spark, path).get
    // one earlier disjoint tombstone so the delete's phase-1 check
    // has real later-snapshot work to do outside the lock
    Snapshots.deleteOptimistic(Seq(200000L).toDF("k"), path, "k", basedOn)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val del = new Thread(() => {
      try {
        start.await()
        Snapshots.deleteOptimistic(
          (1L to 100000L).toDF("k"), path, "k", basedOn)
      } catch { case t: Throwable => errs.add(t) }
    })
    val appenders = (1 to 4).map { i =>
      new Thread(() => {
        try {
          start.await()
          Snapshots.appendOptimistic(
            Seq((300000L + i, s"n$i")).toDF("k", "v"), path,
            maxRetries = 200, backoffMs = 50) // 10 s budget: covers
          // the locked RE-validation of the few fresh commits (tiny),
          // nowhere near the full-batch check a single-phase layout
          // would hold the lock for (tens of seconds at this size)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    (del +: appenders).foreach(_.start()); start.countDown()
    (del +: appenders).foreach(_.join(180000))
    assert(errs.isEmpty,
      s"all writers must commit: ${errs.toArray(Array.empty[Throwable])
        .map(_.getMessage).toSeq}")
    // 1 base + 1 small delete + 1 big delete + 4 appends
    assert(Snapshots.committed(spark, path).size == 7)
    val n = Snapshots.readMerged(spark, path, "k").count()
    // 200k - 1 (small delete) - 100k (big delete; includes no appended
    // keys) + 4 appends
    assert(n == 200000L - 1 - 100000 + 4, s"merged count $n")
  }

  test("staging dirs are invisible to readers and reclaimable") {
    val path = freshPath()
    Snapshots.append(Seq(1).toDF("x"), path)
    // simulate a crashed writer: staged data, never committed
    Seq(999).toDF("x").write.parquet(s"$path/_staging/deadbeef")
    assert(Snapshots.read(spark, path).as[Int].collect().toSeq == Seq(1),
      "a staged-but-uncommitted write must never surface")
    val removed = Snapshots.cleanStaging(spark, path)
    assert(removed == Seq("deadbeef"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_staging/deadbeef")))
    // reclaim is a locked op and releases the lock after
    Snapshots.append(Seq(2).toDF("x"), path)
    assert(Snapshots.cleanStaging(spark, path).isEmpty)
  }

  test("an orphaned snap dir from a crashed commit is reclaimed, not nested into") {
    val path = freshPath()
    Snapshots.append(Seq(1).toDF("x"), path)
    // simulate a writer that died between its rename and its log
    // commit: snap=2 exists on disk but the log never references it
    Seq(999).toDF("x").write.parquet(s"$path/snap=2")
    assert(Snapshots.read(spark, path).as[Int].collect().toSeq == Seq(1))
    // the next committer reuses id 2 — it must REPLACE the orphan,
    // not rename into it (which would commit the crashed writer's
    // rows and hide this writer's)
    val c = Snapshots.appendOptimistic(Seq(7, 8).toDF("x"), path)
    assert(c.id == 2L)
    assert(Snapshots.read(spark, path).as[Int].collect().sorted.toSeq ==
      Seq(1, 7, 8), "snap=2 must hold exactly the committed rows")
    assert(Snapshots.read(spark, path, Some(2L)).as[Int].collect()
      .sorted.toSeq == Seq(1, 7, 8))
  }

  test("ocStats accumulates retries across contended commits") {
    val path = freshPath()
    Snapshots.append(Seq(0).toDF("x"), path)
    // hold the lock from this thread, fire an optimistic appender,
    // release after a beat: the appender must WAIT (retry), not fail
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(path, "_LOCK")
    f.create(lock, false).close()
    @volatile var committed: Option[Snapshots.OptimisticCommit] = None
    val t = new Thread(() => {
      committed = Some(Snapshots.appendOptimistic(
        Seq(7).toDF("x"), path, maxRetries = 2000, backoffMs = 5))
    })
    t.start()
    Thread.sleep(400)
    f.delete(lock, false)
    t.join(120000)
    assert(committed.exists(_.retries > 0),
      s"the writer must have waited: $committed")
    val (retries, aborts) = Snapshots.ocStats(spark, path)
    assert(retries >= committed.get.retries && aborts == 0L)
    assert(Snapshots.read(spark, path).as[Int].collect().sorted.toSeq ==
      Seq(0, 7))
  }
}
