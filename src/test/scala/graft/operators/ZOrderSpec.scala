package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits (hand-computed)") {
    // a=0b11 (bits at 0,2), b=0b10 (bit at 3) -> 0b1101? check:
    // a bit0=1 -> pos0; a bit1=1 -> pos2; b bit0=0 -> pos1; b bit1=1 -> pos3
    val r = Seq((3, 2)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 4)).head.getLong(0)
    assert(r == (1 | (1 << 2) | (1 << 3)))
  }

  test("z-ordered layout shrinks per-file ranges on BOTH dimensions") {
    // uniform 2-d grid: natural order is sorted by x (so x prunes but y
    // doesn't); z-order must bound both
    val n = 1 << 12
    val grid = spark.range(0, n).select(
      (col("id") / 64).cast("int").as("x"),
      (col("id") % 64).cast("int").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val natDir = java.nio.file.Files.createTempDirectory("nat").toString
    ZOrder.writeZOrdered(grid, "x", "y", zDir, partitions = 8, bits = 8)
    grid.repartitionByRange(8, col("x"), col("y"))
      .write.mode("overwrite").parquet(natDir)

    def avgRange(dir: String, c: String): Double = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("r"))
      perFile.agg(avg("r")).head.getDouble(0)
    }
    // natural (x-range-partitioned) layout: x tight, y spans ~full 0..63
    assert(avgRange(natDir, "y") > 50.0)
    // z-order: BOTH dims bounded — each 512-point z-block is a ~32×16
    // rectangle of the 64×64 grid (+ curve-boundary straddle), far below
    // the 63 a single-column sort leaves on its unsorted dimension
    assert(avgRange(zDir, "x") < 40.0, s"x not clustered: ${avgRange(zDir, "x")}")
    assert(avgRange(zDir, "y") < 40.0, s"y not clustered: ${avgRange(zDir, "y")}")
  }
}
