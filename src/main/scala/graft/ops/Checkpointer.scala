package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-cut seam for iterative and multi-consumer operators — the
  * operator-level analog of [[graft.MapPipeline.Barrier]].
  *
  * Iterative loops ([[PageRank.run]], [[graft.llm.Dedup.clusters]]) and
  * multi-pass ranks ([[GlobalRank]]) must cut lineage each round or the
  * plan doubles per iteration; they also re-read the cut frame several
  * times, so it must be materialized, not recomputed. HOW it is
  * materialized is a deployment decision, not operator semantics:
  *
  *   - [[Checkpointer.Local]] (default): `localCheckpoint` — executor-local
  *     blocks, no HDFS round-trip. Correct and fastest on `local[*]` and on
  *     clusters with stable executors, but blocks die with their executor,
  *     so a lost node kills the job mid-iteration.
  *   - [[Checkpointer.Reliable]]: `checkpoint` to the SparkContext's
  *     checkpoint directory (HDFS/object store in production) — survives
  *     executor loss; the right mode for long multi-hour iterative jobs at
  *     100 TB. Requires `sparkContext.setCheckpointDir` to have been called.
  *
  * Both modes produce IDENTICAL results ([[graft.CheckpointerSpec]] proves
  * it); only durability and write cost differ. Operators take a
  * `Checkpointer` parameter defaulting to `Local` so callers flip modes
  * without touching operator code.
  */
trait Checkpointer extends Serializable {
  /** Materialize `df` and return a frame whose plan is a scan of the
    * materialized blocks (lineage cut).
    */
  def cut(df: DataFrame): DataFrame
}

object Checkpointer {

  /** Executor-local blocks (`Dataset.localCheckpoint`, eager). */
  case object Local extends Checkpointer {
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** Reliable checkpoint (`Dataset.checkpoint`, eager) into
    * `sparkContext.getCheckpointDir` — set it before use.
    *
    * Storage note for iterative callers: each cut writes a new `rdd-N`
    * directory and Spark does not delete superseded ones by default, so a
    * k-iteration loop holds k snapshots. Set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (GC-driven
    * cleanup of orphaned checkpoints) and/or point the checkpoint dir at a
    * per-job path deleted on completion — only the latest cut is ever
    * needed for recovery.
    */
  case object Reliable extends Checkpointer {
    def cut(df: DataFrame): DataFrame = {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Checkpointer.Reliable needs sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    }
  }
}
