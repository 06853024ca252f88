package graft

import org.apache.spark.sql.functions._
import graft.ext.LayoutOps

class LayoutOpsSpec extends SparkSpec {

  test("zValue2: hand-computed Morton codes") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (255L, 255L)).toDF("x", "y")
    val got = df.select(LayoutOps.zValue2(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): x=011 → bits at 0,2; y=101 → bits at 1,5 → 1+4+2+32 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, 65535L))
  }

  test("zValue2Sql mirrors zValue2 bit-for-bit (via Spark eval)") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i % 8, i / 8)).toDF("x", "y")
    // the generated twin uses >>/<<//& only — valid Spark SQL too
    val sql = LayoutOps.zValue2Sql("x", "y", 3)
    val a = df.select(LayoutOps.zValue2(col("x"), col("y"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val b = df.selectExpr(s"cast($sql as bigint) as z")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("zOrderAudit: uniform grid — z buckets are quadrants bounded in " +
    "BOTH dims, linear strips span the full y range") {
    import spark.implicits._
    // full 16x16 grid, bits=4 (mask 15, so sx == x), nBuckets=4
    val grid = (for (x <- 0 to 15; y <- 0 to 15) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = LayoutOps.zOrderAudit(grid, "x", "y", bits = 4, nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val zb = out.filter(_._1 == "zorder").sortBy(_._2)
    val lb = out.filter(_._1 == "linear").sortBy(_._2)
    assert(zb.length == 4 && lb.length == 4)
    // every bucket holds a quarter of the grid
    assert(zb.forall(_._3 == 64L) && lb.forall(_._3 == 64L))
    // z buckets: 8x8 quadrants — width 7 in BOTH dims
    assert(zb.forall(b => b._5 - b._4 == 7L && b._7 - b._6 == 7L))
    // linear buckets: 4-wide strips, FULL y range
    assert(lb.forall(b => b._5 - b._4 == 3L && b._7 - b._6 == 15L))
    // exact ppm: both rectangulations cover the grid once (64/256)
    assert(zb.forall(_._8 == 250000L) && lb.forall(_._8 == 250000L))
    // single-dim predicate y=0 skips 2 of 4 z buckets, 0 of 4 linear
    assert(zb.count(b => b._6 <= 0L && 0L <= b._7) == 2)
    assert(lb.count(b => b._6 <= 0L && 0L <= b._7) == 4)
  }

  test("graft_hilbert: canonical 4x4 curve, unit-step adjacency, " +
    "SQL twin bit-equal") {
    import spark.implicits._
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = grid.select(col("x"), col("y"),
        call_function("graft_hilbert", col("x"), col("y"), lit(2)).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // the canonical xy2d walk of the 4x4 grid
    assert(d((0L, 0L)) == 0L && d((1L, 0L)) == 1L && d((1L, 1L)) == 2L &&
      d((0L, 1L)) == 3L)
    assert(d((0L, 2L)) == 4L && d((3L, 0L)) == 15L)
    assert(d.values.toSeq.sorted == (0L to 15L))
    // continuity: consecutive indices are Manhattan-adjacent cells —
    // the property Morton lacks (its quadrant seams jump)
    val byD = d.toSeq.map(_.swap).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump between d cells ($x1,$y1) -> ($x2,$y2)")
    }
    // the generated SQL steps replay bit-for-bit (Spark can run them:
    // same operators) for bits=3 over the 8x8 grid
    val g8 = (for (x <- 0 to 7; y <- 0 to 7) yield (x.toLong, y.toLong))
      .toDF("sx", "sy")
    g8.createOrReplaceTempView("hil_g8")
    val sqlSteps = graft.ext.LayoutOps
      .hilbertStepsSql("hil_g8", Seq.empty, 3)
    val viaSql = spark.sql(s"SELECT sx, sy, hd FROM $sqlSteps q")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val viaExpr = g8.select(col("sx"), col("sy"),
        call_function("graft_hilbert", col("sx"), col("sy"), lit(3))
          .as("hd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(viaSql == viaExpr)
  }

  test("hilbertAudit: uniform grid buckets are connected quadrants " +
    "bounded in both dims") {
    import spark.implicits._
    val grid = (for (x <- 0 to 15; y <- 0 to 15) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = graft.ext.LayoutOps
      .hilbertAudit(grid, "x", "y", bits = 4, nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val hb = out.filter(_._1 == "hilbert")
    assert(hb.length == 4 && hb.forall(_._3 == 64L))
    // contiguous quarter-ranges of the Hilbert walk ARE the quadrants
    assert(hb.forall(b => b._5 - b._4 == 7L && b._7 - b._6 == 7L))
  }

  test("zValue3: hand-computed 3-D Morton codes; audit buckets bound " +
    "ALL three dims on the uniform cube") {
    import spark.implicits._
    val pts = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (3L, 5L, 2L)).toDF("x", "y", "z")
    val got = pts.select(graft.ext.LayoutOps
        .zValue3(col("x"), col("y"), col("z"), 4).as("d"))
      .collect().map(_.getLong(0)).toSeq
    // x→bits 3k, y→3k+1, z→3k+2: (1,0,0)=1 (0,1,0)=2 (0,0,1)=4
    // (1,1,1)=7; (3,5,2): x=011→1+8=9; y=101→2+128=130; z=010→32
    assert(got == Seq(0L, 1L, 2L, 4L, 7L, 9L + 130L + 32L))
    // uniform 8x8x8 cube, bits=3, nBuckets=8 → octants: every zorder3
    // bucket bounded to width 3 in ALL dims; linear strips span y,z
    val cube = (for (x <- 0 to 7; y <- 0 to 7; z <- 0 to 7)
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val out = graft.ext.LayoutOps
      .zOrderAudit3(cube, "x", "y", "z", bits = 3, nBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(2),
        r.getLong(4) - r.getLong(3), r.getLong(6) - r.getLong(5),
        r.getLong(8) - r.getLong(7)))
    val zb = out.filter(_._1 == "zorder3")
    val lb = out.filter(_._1 == "linear")
    assert(zb.length == 8 && zb.forall(_._2 == 64L))
    assert(zb.forall(b => b._3 == 3L && b._4 == 3L && b._5 == 3L))
    assert(lb.forall(b => b._3 == 0L && b._4 == 7L && b._5 == 7L))
  }

  test("zOrderAudit: degenerate single-value dimension pins cell 0; " +
    "bad nBuckets rejected") {
    import spark.implicits._
    val df = Seq((5L, 1L), (5L, 9L), (5L, 3L)).toDF("x", "y")
    val out = LayoutOps.zOrderAudit(df, "x", "y", bits = 4, nBuckets = 2)
      .collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    intercept[IllegalArgumentException] {
      LayoutOps.zOrderAudit(df, "x", "y", bits = 4, nBuckets = 3)
    }
  }

  test("grid scaling survives wide-range key domains (BIGINT product " +
    "would wrap; decimal branch keeps cells exact)") {
    import spark.implicits._
    // range ≈ 2^62 at bits=8 → (v-lo)*255 overflows a long; the
    // r13-advice widening must land min at cell 0, max at cell 255,
    // and keep every cell in range — wrapped arithmetic would throw
    // the audit's extents wildly out of [0, 255].
    val lo = Long.MinValue / 2
    val hi = Long.MaxValue / 2
    val df = Seq((lo, 0L), (hi, 10L), (0L, 5L), (hi / 3, 7L))
      .toDF("x", "y")
    val out = LayoutOps.zOrderAudit(df, "x", "y", bits = 8, nBuckets = 2)
      .collect()
    val cells = out.flatMap(r => Seq(r.getLong(3), r.getLong(4))) // min/max x
    assert(cells.forall(c => c >= 0L && c <= 255L))
    assert(cells.min == 0L && cells.max == 255L)
  }
}
