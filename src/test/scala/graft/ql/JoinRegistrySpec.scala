package graft.ql

import graft.SpecBase
import java.nio.file.Files

/** The `_JOINS` per-db registry: save/load fidelity, upsert keys, and
  * the forDb auto-load that makes `FROM a, b` work with no per-query
  * declaration (the reference's stored `.join` definitions). */
class JoinRegistrySpec extends SpecBase {
  import spark.implicits._

  test("save/load round-trips every field of both relation kinds") {
    val root = Files.createTempDirectory("graft_jreg").toString
    val js = Seq(JoinDef("dets", "det_id", "objs", "obj_id"))
    val sjs = Seq(
      SpatialJoinDef("dets", "det_id", "det_lon", "det_lat",
        "objs", "obj_id", "obj_lon", "obj_lat", 0.05),
      SpatialJoinDef("a", "id", "lon", "lat", "b", "id2", "lon2", "lat2",
        0.87, nmax = 3, hotThreshold = Some(1000L), salts = 8,
        snapD6 = true))
    JoinRegistry.save(spark, root, js, sjs)
    val (gotJ, gotS) = JoinRegistry.load(spark, root)
    assert(gotJ == js && gotS == sjs)
  }

  test("missing registry loads empty; unknown kinds are skipped") {
    val root = Files.createTempDirectory("graft_jreg_none").toString
    assert(JoinRegistry.load(spark, root) == ((Nil, Nil)))
    // forward compat: a future kind must not break old readers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_JOINS"),
      """{"kind":"graph","left":"x"}""".getBytes("UTF-8"))
    assert(JoinRegistry.load(spark, root) == ((Nil, Nil)))
  }

  test("a malformed KNOWN kind fails loudly instead of vanishing") {
    // review r18: silently dropping a corrupt spatial entry would make
    // the next FROM a, b resolve through a DIFFERENT relation
    val root = Files.createTempDirectory("graft_jreg_corrupt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_JOINS"),
      """{"kind":"spatial","left":"dets","leftKey":"id"}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      JoinRegistry.load(spark, root)
    }
    assert(e.getMessage.contains("malformed spatial entry"))
  }

  test("declare upserts by table pair; declareSpatial by directed pair") {
    val root = Files.createTempDirectory("graft_jreg_up").toString
    JoinRegistry.declare(spark, root, JoinDef("a", "k1", "b", "k1"))
    JoinRegistry.declare(spark, root, JoinDef("b", "k2", "a", "k2"))
    val (js, _) = JoinRegistry.load(spark, root)
    assert(js == Seq(JoinDef("b", "k2", "a", "k2")),
      "redeclaring the unordered pair must replace, not shadow")
    val s1 = SpatialJoinDef("a", "id", "lo", "la", "b", "id", "lo", "la", 0.1)
    JoinRegistry.declareSpatial(spark, root, s1)
    JoinRegistry.declareSpatial(spark, root, s1.copy(radiusDeg = 0.2))
    JoinRegistry.declareSpatial(spark, root,
      SpatialJoinDef("b", "id", "lo", "la", "a", "id", "lo", "la", 0.3))
    val (_, sjs) = JoinRegistry.load(spark, root)
    assert(sjs.map(_.radiusDeg) == Seq(0.2, 0.3),
      "directed a->b replaced; b->a is a distinct relation")
  }

  test("a bad NUMERIC field reports the offending line, not a bare NFE") {
    // review r19 (ADVICE): "nmax":2.5 used to surface as a raw
    // NumberFormatException with no pointer to the corrupt line
    val root = Files.createTempDirectory("graft_jreg_num").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_JOINS"),
      ("""{"kind":"spatial","left":"a","leftKey":"id","lonL":"lo",""" +
        """"latL":"la","right":"b","rightKey":"id","lonR":"lo",""" +
        """"latR":"la","radiusDeg":0.1,"nmax":2.5,"salts":16,""" +
        """"snapD6":false}""").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      JoinRegistry.load(spark, root)
    }
    assert(e.getMessage.contains("malformed spatial entry") &&
      e.getMessage.contains("nmax"), e.getMessage)
  }

  test("concurrent declares of DIFFERENT relations both land") {
    // review r19 (ADVICE): the unsynchronized load-modify-save could
    // drop an unrelated relation — stronger than the documented
    // last-writer-wins on the same key. Declares now serialize
    // through the _JOINS.lock create-exclusive file.
    val root = Files.createTempDirectory("graft_jreg_conc").toString
    val defs = (0 until 8).map(i => JoinDef(s"t$i", "k", s"u$i", "k"))
    val threads = defs.map { d =>
      new Thread(() => JoinRegistry.declare(spark, root, d))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (js, _) = JoinRegistry.load(spark, root)
    assert(js.toSet == defs.toSet,
      s"every concurrently declared relation must survive, got $js")
    // the lock file is released
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_JOINS.lock")))
  }

  test("a stale declare lock is broken, not a permanent brick") {
    val root = Files.createTempDirectory("graft_jreg_stale").toString
    val lock = java.nio.file.Paths.get(root, "_JOINS.lock")
    java.nio.file.Files.createFile(lock)
    // backdate past the stale threshold (30s)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    JoinRegistry.declare(spark, root, JoinDef("a", "k", "b", "k"))
    val (js, _) = JoinRegistry.load(spark, root)
    assert(js == Seq(JoinDef("a", "k", "b", "k")))
  }

  test("heartbeat: a holder outliving the stale window is not broken") {
    // review r19 (ADVICE): a declare legitimately holding the lock
    // longer than LockStaleMs (slow object-store save) used to have
    // its lock broken by a waiter — reopening the lost-update window.
    // The holder now touches the lock's mtime every third of the
    // window, so a LIVE hold never looks stale.
    val root = Files.createTempDirectory("graft_jreg_beat").toString
    // both sides take the shrunken window as a CALL parameter (no
    // shared mutable threshold — review r20); window/heartbeat = 3x
    // leaves ~1.3s of slack for a GC pause between touches
    val staleMs = 2000L
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val released = new java.util.concurrent.atomic.AtomicLong(0L)
    val acquired = new java.util.concurrent.atomic.AtomicLong(0L)
    val holder = new Thread(() =>
      JoinRegistry.withDeclareLock(spark, root, staleMs) {
        inLock.countDown()
        Thread.sleep(5000) // > 2x the (shrunken) stale window
        released.set(System.nanoTime())
      })
    holder.start()
    inLock.await()
    JoinRegistry.withDeclareLock(spark, root, staleMs) {
      acquired.set(System.nanoTime())
    }
    holder.join()
    assert(released.get != 0L && acquired.get > released.get,
      "the waiter must block until the live holder releases — a " +
        "broken lock would let it acquire mid-hold")
  }

  test("names with JSON-hostile characters are refused loudly") {
    val root = Files.createTempDirectory("graft_jreg_bad").toString
    intercept[IllegalArgumentException] {
      JoinRegistry.declare(spark, root,
        JoinDef("""ta"ble""", "k", "b", "k"))
    }
  }

  test("forDb resolves a registry spatial relation with no declaration") {
    val root = Files.createTempDirectory("graft_jreg_fordb").toString
    val rnd = new scala.util.Random(11)
    val objs = (0L until 80L).map(i => (i, rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))))
      .toDF("obj_id", "obj_lon", "obj_lat")
    val dets = objs.selectExpr("obj_id * 10 AS det_id",
      "obj_lon + 0.001 AS det_lon", "obj_lat + 0.001 AS det_lat")
    objs.write.parquet(s"$root/objs.parquet")
    dets.write.parquet(s"$root/dets.parquet")
    JoinRegistry.declareSpatial(spark, root,
      SpatialJoinDef("dets", "det_id", "det_lon", "det_lat",
        "objs", "obj_id", "obj_lon", "obj_lat", 0.05))
    val df = LsdQL.forDb(graft.LsdDb(spark, root)).query(
      "SELECT det_id, obj_id FROM dets, objs WHERE _NR = 1")
    val rows = df.collect()
    assert(rows.length == 80 &&
      rows.forall(r => r.getLong(0) == r.getLong(1) * 10))
  }
}
