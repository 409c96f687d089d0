package graft.sources

import graft.SpecBase
import org.apache.spark.sql.functions._

import java.nio.file.Files

class FitsSpec extends SpecBase {
  import spark.implicits._

  private lazy val df = (0L until 1000L).map { i =>
    (i, (i % 7).toInt, i * 0.125 - 3.5, (i % 13).toFloat / 8f,
      s"name_${i % 20}")
  }.toDF("id", "small", "x", "y", "tag")

  test("all supported types round-trip bit-exactly across partitions") {
    val path = Files.createTempDirectory("graft_fits").toString + "/t"
    Fits.write(df.repartition(4), path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".fits"))
    assert(parts.length == 4, "one FITS file per partition")
    // every file is a whole number of 2880-byte blocks (the standard)
    assert(parts.forall(_.length % 2880 == 0),
      "FITS files must be block-aligned")
    val back = Fits.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().map(_.toSeq)
    val b = back.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // bit-exact incl. doubles/floats
  }

  test("negative values, special doubles, and empty strings survive") {
    val path = Files.createTempDirectory("graft_fits2").toString + "/t"
    val special = Seq(
      (-1L, Int.MinValue, -0.0, Float.MinPositiveValue, ""),
      (Long.MaxValue, Int.MaxValue, Double.MinPositiveValue, -1.5f, "x"),
      (0L, 0, 1.0 / 3.0, 0f, "exact width 24 chars ok!"))
      .toDF("id", "small", "x", "y", "tag")
    Fits.write(special, path)
    val back = Fits.read(spark, path).orderBy("id").collect()
    val want = special.orderBy("id").collect()
    back.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getInt(1) == w.getInt(1))
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(w.getDouble(2)))
      assert(g.getFloat(3) == w.getFloat(3))
      assert(g.getString(4) == w.getString(4))
    }
  }

  test("oversize strings and nulls are rejected, not corrupted") {
    val path = Files.createTempDirectory("graft_fits3").toString + "/t"
    val tooLong = Seq((1L, "x" * 30)).toDF("id", "tag")
    intercept[org.apache.spark.SparkException] {
      Fits.write(tooLong, path)
    }
    val withNull = Seq((1L, null: String), (2L, "ok")).toDF("id", "tag")
    intercept[org.apache.spark.SparkException] {
      Fits.write(withNull, path + "2")
    }
  }

  test("trailing-space semantics: FITS pads with blanks (documented)") {
    // the standard stores fixed-width blank-padded ASCII, so trailing
    // spaces are not representable — they come back stripped
    val path = Files.createTempDirectory("graft_fits4").toString + "/t"
    Seq((1L, "pad  ")).toDF("id", "tag").transform { d =>
      Fits.write(d, path); d
    }
    assert(Fits.read(spark, path).head.getString(1) == "pad")
  }

  test("empty partitions produce valid zero-row tables") {
    val path = Files.createTempDirectory("graft_fits5").toString + "/t"
    Fits.write(df.filter(col("id") < 2).repartition(3), path)
    val back = Fits.read(spark, path)
    assert(back.count() == 2)
  }

  test("scaled multi-HDU: image extension skipped, TSCAL/TZERO exact") {
    val path = Files.createTempDirectory("graft_fits6").toString + "/t"
    // ints via the offset trick, doubles via a binary-exact 2^-2 scale
    val src = (0L until 500L).map { i =>
      (i, (i % 60000).toInt, i * 0.25, s"t${i % 9}")
    }.toDF("id", "cnt", "q", "tag")
    Fits.writeScaled(src.repartition(3), path, Map(
      "cnt" -> Fits.Scaled("I", 1.0, 32768.0),
      "id" -> Fits.Scaled("K", 1.0, 4294967296.0),
      "q" -> Fits.Scaled("J", 0.25, 0.0)))
    val back = Fits.read(spark, path)
    // scaled columns surface as physical DOUBLEs
    assert(back.schema("cnt").dataType.typeName == "double")
    assert(back.schema("id").dataType.typeName == "double")
    assert(back.schema("q").dataType.typeName == "double")
    assert(back.schema("tag").dataType.typeName == "string")
    val got = back.select(col("id").cast("long"), col("cnt").cast("int"),
      col("q"), col("tag")).orderBy("id").collect().map(_.toSeq)
    val want = src.select("id", "cnt", "q", "tag")
      .orderBy("id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq) // bit-exact through raw int storage
  }

  test("scaled write rejects lossy values instead of corrupting") {
    val path = Files.createTempDirectory("graft_fits7").toString + "/t"
    // 0.3 is not a multiple of 0.25 — must throw, not round silently
    val lossy = Seq((1L, 0.3)).toDF("id", "q")
    intercept[org.apache.spark.SparkException] {
      Fits.writeScaled(lossy, path, Map("q" -> Fits.Scaled("J", 0.25, 0.0)))
    }
    // int16 overflow under the offset must throw too
    val over = Seq((1L, 99999.0)).toDF("id", "q")
    intercept[org.apache.spark.SparkException] {
      Fits.writeScaled(over, path + "2",
        Map("q" -> Fits.Scaled("I", 1.0, 32768.0)))
    }
  }

  test("variable-length arrays round-trip bit-exactly via the heap") {
    val path = Files.createTempDirectory("graft_fits9").toString + "/t"
    // ragged lengths incl. empty arrays; float and long elements
    val src = (0L until 300L).map { i =>
      (i,
        (0L until i % 7).map(j => (i * 31 + j).toFloat / 8f).toArray,
        (0L until i % 4).map(j => i * 1000 + j).toArray)
    }.toDF("id", "fv", "lv")
    Fits.write(src.repartition(3), path)
    val back = Fits.read(spark, path)
    assert(back.schema("fv").dataType.typeName == "array")
    assert(back.schema("lv").dataType.typeName == "array")
    val got = back.orderBy("id")
      .as[(Long, Array[Float], Array[Long])].collect()
    val want = src.orderBy("id")
      .as[(Long, Array[Float], Array[Long])].collect()
    got.zip(want).foreach { case ((gi, gf, gl), (wi, wf, wl)) =>
      assert(gi == wi)
      assert(gf.toSeq == wf.toSeq, s"row $gi float VLA")
      assert(gl.toSeq == wl.toSeq, s"row $gi long VLA")
    }
    // PCOUNT is the heap size: files stay block-aligned
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".fits"))
    assert(parts.forall(_.length % 2880 == 0))
  }

  test("plain (unscaled) files still read via the HDU walk") {
    // regression: read() now walks HDUs instead of assuming HDU 2
    val path = Files.createTempDirectory("graft_fits8").toString + "/t"
    Fits.write(df.limit(10), path)
    assert(Fits.read(spark, path).count() == 10)
  }
}
