package graft.tools

/** Scratch diagnostics for connectedComponents round behavior. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Engine.session("cc-probe", Some("local[4]"),
      shufflePartitions = 4)
    import spark.implicits._
    val ids = (0 until 256).map(i => Integer.reverse(i) >>> 24).map(_.toLong)
    val pairs = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("id_a", "id_b")
    val got = graft.ext.DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"size=${got.size} nonzero=${got.values.count(_ != 0L)} " +
      s"rounds=${graft.ext.DedupOps.lastCcRounds.get()} " +
      s"jumps=${graft.ext.DedupOps.lastCcJumps.get()}")
    spark.stop()
  }
}
