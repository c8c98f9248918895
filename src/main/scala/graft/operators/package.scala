package graft

import org.apache.spark.sql.DataFrame

/** Operator-package helpers. */
package object operators {

  /** `.pinnedCut` — the operators' eager checkpoint. Identical results
    * to `.localCheckpoint()` (same eager materialization, same
    * LogicalRDD lifecycle for [[graft.Blocks]]), but the cut KEEPS the
    * frame's hash partitioning visible to downstream plans: under AQE a
    * plain `localCheckpoint()` captures `UnknownPartitioning`, so every
    * "pinned partitioning" frame in the iterative family was silently
    * re-exchanged by each per-round consumer (measured at sf0.1:
    * sccPivot re-shuffled the full 21 MB tagged edge frame twice per
    * round — per-round executor task time 50 s → 4-8 s after the fix).
    * See [[graft.Blocks.pinnedCut]] for the mechanism. */
  implicit final class PinnedCutOps(private val df: DataFrame) extends AnyVal {
    def pinnedCut: DataFrame = Blocks.pinnedCut(df)
  }
}
