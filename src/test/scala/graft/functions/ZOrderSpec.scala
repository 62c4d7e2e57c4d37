package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // reference interleave: plain bit loop
  private def zRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private val samples: Seq[(Long, Long)] =
    Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (255L, 1L),
      (65535L, 65535L), (32768L, 1L), (12345L, 54321L)) ++
      (0L until 64L).map(i => (i * 977 % 65536, i * 3251 % 65536))

  test("mask-spread interleave equals the bit-loop reference") {
    val out = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.z16(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z is a bijection on the 16-bit grid sample") {
    val grid = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(ZOrder.z16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length == grid.length)
    assert(zs.min == 0L && zs.max == 1023L) // 32x32 fills 0..2^10-1
  }

  test("quadtree alignment: dropping 2k key bits halves each " +
    "coordinate k times") {
    val out = samples.toDF("x", "y")
      .select(shiftrightunsigned(ZOrder.z16(col("x"), col("y")), 6)
          .as("tile"),
        ZOrder.z16(shiftrightunsigned(col("x"), 3),
          shiftrightunsigned(col("y"), 3)).as("tile2"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
