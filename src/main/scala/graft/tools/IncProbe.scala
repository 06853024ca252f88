package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.DedupOps

/** Stage-timing probe for x_dedup_incremental_cc: separates the day-1
  * history SETUP (full LSH + CC over the documents table — in
  * production these labels are already persisted) from the actual
  * per-day incremental cost (batch-touching pair generation + frontier
  * contraction merge). r12 triage with this probe caught the inlined
  * minhash-sig band expansion (48 s → 0.9 s band join at sf0.1). */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Engine.session(
      "graft-inc-probe", Some("local[32]"), 32)
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val day1 = graft.engine.Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val day2 = day1.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    // The r13 expanded-pair comparison costs ~385 s at sf10 — opt in
    // with GRAFT_PROBE_EXPANDED=1 when the regression story needs it.
    val day1Labels =
      if (sys.env.get("GRAFT_PROBE_EXPANDED").contains("1")) {
        val day1Pairs = tm("day1 pairs (setup, materialize)") {
          graft.engine.Engine.materialize(
            DedupOps.nearDupPairsMinhash(day1, "doc_id", "text",
              2, 64, 16, 0.8))
        }
        tm("day1 CC over expanded pairs (r13 shape)") {
          DedupOps.connectedComponents(day1Pairs)
        }
      } else tm("day1 componentsNearMinhash (labels only)") {
        DedupOps.componentsNearMinhash(day1, "doc_id", "text",
          2, 64, 16, 0.8)
      }
    // The r14 shape: closure at REPRESENTATIVE grain, labels expanded
    // through the id↔class join — includes its own LSH pipeline (rep
    // stages), so this number is the WHOLE day-1 setup.
    tm("day1 componentsNearMinhash (supernode, r14 shape, end-to-end)") {
      DedupOps.componentsNearMinhash(day1, "doc_id", "text",
        2, 64, 16, 0.8).count()
    }
    // Split the convenience form into its two halves: the history
    // index build is DAY-1 SETUP (production persists it, buildNearDup
    // Index is append-only across days); only the probe+verify against
    // the prebuilt index is the recurring per-day cost.
    val histIx = tm("history index build (amortized: persisted)") {
      graft.engine.Engine.materialize(
        DedupOps.buildNearDupIndex(day1, "doc_id", "text", 2, 64))
    }
    // r15 shape: closure labels + index from ONE RepStages — the
    // day-1 end-to-end cost when both artifacts are produced together
    // (componentsNearMinhash + buildNearDupIndex shingled day 1 twice).
    tm("day1 labels+index single pass (r15 shape, end-to-end)") {
      val (lbl, ix) = DedupOps.componentsAndIndexNearMinhash(
        day1, "doc_id", "text", 2, 64, 16, 0.8)
      lbl.count() + ix.count()
    }
    val newPairs = tm("incremental pairs vs prebuilt index (per-day)") {
      graft.engine.Engine.materialize(
        DedupOps.incrementalNearDupPairsWithIndex(day2, histIx,
          "doc_id", "text", 2, 64, 16, 0.8))
    }
    println("[probe] newPairs rows: " + newPairs.count())
    val out = tm("incrementalComponents + collect") {
      DedupOps.incrementalComponents(day1Labels, newPairs).collect().length
    }
    println("[probe] out rows: " + out)
    spark.stop()
  }
}
