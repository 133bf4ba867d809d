package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave over already-binned ids. */
  private def mortonRef(binIds: Seq[Long], bits: Int): Long =
    (for { i <- 0 until bits; j <- binIds.indices } yield
      ((binIds(j) >> i) & 1L) << (i * binIds.size + j)).sum

  test("z-value matches an independent Morton model on exact bin corners") {
    // values at exact bin boundaries of [0, 15] with 16 bins: bin = value
    val rows = for { a <- 0 until 16; b <- 0 until 16 }
      yield (a.toDouble, b.toDouble)
    val df = rows.toDF("x", "y")
    val got = Layout.zorderValue(df, Seq("x", "y"), bitsPerDim = 4)
      .select("x", "y", "z_value").as[(Double, Double, Long)]
      .collect().map { case (x, y, z) => ((x.toLong, y.toLong), z) }.toMap
    for { a <- 0 until 16; b <- 0 until 16 } {
      // bin = floor(v * 16 / 15) clamped, so v=15 -> bin 15, v=k -> k*16/15
      val ba = math.min(15L, math.floor(a * 16.0 / 15.0).toLong)
      val bb = math.min(15L, math.floor(b * 16.0 / 15.0).toLong)
      assert(got((a.toLong, b.toLong)) === mortonRef(Seq(ba, bb), 4),
        s"($a,$b)")
    }
  }

  test("constant dimension collapses to bin 0; z stays within long range") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val z = Layout.zorderValue(df, Seq("x", "y"), 4)
      .select("z_value").as[Long].collect()
    // y contributes nothing (all bits 0) -> z = interleave(xbin, 0)
    assert(z.forall(v => v >= 0))
    assert(z.distinct.length == 3) // x still separates
  }

  test("range-partitioning by z tightens per-file min/max on BOTH dims") {
    val n = 4096
    // two independent uniform dims, shuffled order (worst case for layout)
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % n).toDouble, ((i * 40503L) % n).toDouble)
    }.toDF("x", "y")

    def meanSpan(clustered: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = clustered
        .groupBy(spark_partition_id().as("p"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx").as("ax"), avg("sy").as("ay"))
        .as[(Double, Double)].head()
      (spans._1 / n, spans._2 / n)
    }

    val zed = Layout.zorderValue(df, Seq("x", "y"), 4)
      .repartitionByRange(16, col("z_value"))
    val (zx, zy) = meanSpan(zed)
    val (rx, ry) = meanSpan(df.repartition(16))
    // random layout: every partition spans ~the full range on both dims
    assert(rx > 0.9 && ry > 0.9, s"baseline spans ($rx, $ry)")
    // z-order: 16 partitions of an 8-bit curve -> each covers a hyper-box
    // of roughly 1/4 x 1/4 of the space (plus bin-edge slack)
    assert(zx < 0.5 && zy < 0.5, s"zordered spans ($zx, $zy)")
  }

  test("z-value expression stays inside whole-stage codegen") {
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val z = Layout.zorderValue(df, Seq("x", "y"), 4)
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("writeZordered round-trips and drops the internal column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = (0 until 256).map(i => (i.toDouble, (255 - i).toDouble, i.toLong))
      .toDF("x", "y", "id")
    Layout.writeZordered(df, Seq("x", "y"), 4, numFiles = 4, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet == Set("x", "y", "id"))
    assert(back.count() == 256)
  }

  /** Reference xy2d Hilbert walk (the canonical bit algorithm). */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0; var y = y0; var d = 0L; var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert: reference walk is a bijection with unit-step locality; " +
      "the order-1 quadrant order is the canonical U") {
    // defining property Morton lacks: consecutive indexes are ADJACENT
    val bits = 4
    val cells = (for { x <- 0 until 16; y <- 0 until 16 }
      yield hilbertRef(bits, x, y) -> (x, y)).toMap
    assert(cells.size == 256) // bijection
    (0 until 255).foreach { d =>
      val (x1, y1) = cells(d.toLong); val (x2, y2) = cells(d.toLong + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
    assert(Seq((0, 0), (0, 1), (1, 1), (1, 0))
      .map { case (x, y) => hilbertRef(1, x, y) } == Seq(0, 1, 2, 3))
  }

  test("hilbertValue matches the reference walk exhaustively on exact " +
      "bin corners") {
    val rows = for { a <- 0 until 16; b <- 0 until 16 }
      yield (a.toDouble, b.toDouble)
    val got = Layout.hilbertValue(rows.toDF("x", "y"), Seq("x", "y"),
        bitsPerDim = 4)
      .select("x", "y", "h_value").as[(Double, Double, Long)]
      .collect().map { case (x, y, h) => ((x.toLong, y.toLong), h) }.toMap
    for { a <- 0 until 16; b <- 0 until 16 } {
      val ba = math.min(15L, math.floor(a * 16.0 / 15.0).toLong)
      val bb = math.min(15L, math.floor(b * 16.0 / 15.0).toLong)
      assert(got((a.toLong, b.toLong)) === hilbertRef(4, ba, bb), s"($a,$b)")
    }
  }
}
