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
