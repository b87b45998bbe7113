package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Proofs-by-enumeration for the Hilbert index ([[LayoutQueries.withHilbert]])
  * over the full 16×16 grid: the mapping is a bijection onto 0..255, and
  * consecutive codes are ALWAYS Manhattan-distance-1 neighbors — the
  * locality theorem that separates Hilbert from Morton (whose
  * consecutive codes jump up to 15 cells at tile boundaries; measured
  * here too, so the comparison is enumerated rather than asserted).
  */
class HilbertSpec extends SparkFunSuite {
  import spark.implicits._

  private def grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
    .toDF("x", "y")

  test("hilbert index is a bijection onto 0..255") {
    val h = LayoutQueries.withHilbert(grid).select("h")
      .collect().map(_.getLong(0)).sorted
    assert(h.toSeq == (0L until 256L))
  }

  test("consecutive hilbert codes are always adjacent cells; morton jumps") {
    val cells = LayoutQueries.withHilbert(grid)
      .collect().map(r => r.getAs[Long]("h") -> (r.getAs[Long]("x"), r.getAs[Long]("y")))
      .sortBy(_._1).map(_._2)
    val hJumps = cells.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(hJumps.forall(_ == 1L), s"non-unit Hilbert jump: max ${hJumps.max}")
    // Morton, enumerated on the same grid for contrast: interleave bits
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))).sum
    val mCells = (for (x <- 0L until 16L; y <- 0L until 16L) yield morton(x, y) -> (x, y))
      .sortBy(_._1).map(_._2)
    val mJumps = mCells.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(mJumps.max > 1L, "Morton should jump at tile boundaries")
    assert(mJumps.max == 16L) // the worst half-grid snap-back on a 16-grid
  }
}
