package graft

import org.apache.spark.sql.functions._

/** The two defining laws of the Hilbert curve, checked over the ENTIRE
  * 256×256 grid the layout operator indexes — stronger than the DuckDB
  * oracle (which proves only cross-ENGINE equality, not that the chain
  * computes the curve):
  *   1. bijectivity — every cell gets a distinct d in [0, 65535];
  *   2. unit-step adjacency — consecutive d values are ADJACENT cells
  *      (Manhattan distance exactly 1), the continuity property Z-order
  *      lacks and the whole reason the layout gives tighter per-file
  *      min/max bounds.
  * A wrong rotation/reflection in any of the 8 unrolled stages breaks
  * law 2 at the corresponding scale, so the full-grid check pins every
  * stage. */
class HilbertSpec extends SparkSpec {

  private lazy val grid = {
    val g = spark.range(65536).select(
      (col("id") % 256).as("gx"),
      expr("id div 256").as("gy"))
    graft.sources.Layout.hilbertIndex(g, "gx", "gy")
      .select(col("gx"), col("gy"), col("hd"))
  }

  test("hilbertIndex is a bijection onto [0, 65535]") {
    val row = grid.agg(
      countDistinct(col("hd")).as("nd"),
      min(col("hd")).as("lo"), max(col("hd")).as("hi")).head()
    assert(row.getLong(0) === 65536L)
    assert(row.getLong(1) === 0L)
    assert(row.getLong(2) === 65535L)
  }

  test("consecutive d values are adjacent cells (Manhattan distance 1)") {
    val a = grid.select(col("hd"), col("gx"), col("gy"))
    val b = grid.select((col("hd") - 1).as("hd"),
      col("gx").as("nx"), col("gy").as("ny"))
    val bad = a.join(b, "hd")
      .filter(abs(col("gx") - col("nx")) + abs(col("gy") - col("ny")) =!= 1)
      .count()
    assert(bad === 0L)
  }
}
