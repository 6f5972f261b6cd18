package graft.scale

import org.apache.spark.sql.DataFrame

/** Lineage truncation for multiply-consumed intermediate frames (the
  * r15 materialization sites): one eager materialization so an
  * expensive upstream subplan never re-executes per consumer
  * (expression-id drift defeats ReuseExchange for these shapes).
  *
  * Default is `localCheckpoint(true)` — executor-memory blocks, the
  * fastest truncation, but the blocks die with their executor, so on a
  * cluster with executor churn a long job would abort (guide §5). Pass
  * `checkpointDir` (HDFS/object store) there: the frame is written as a
  * reliable checkpoint that survives executor loss. Same contract as
  * [[Dedup.componentsStats]]' per-round truncation, factored out for
  * the single-shot sites (globalRank, rfm, budgetSelect,
  * triangleStats). Results are identical on either path — parity is
  * spec-pinned. */
object Lineage {

  /** Materialize `df` eagerly and cut its lineage. `checkpointDir = None`
    * → localCheckpoint; `Some(dir)` → reliable checkpoint under a
    * per-call UUID subdirectory of `dir` (never collides with, or
    * deletes, another call's files). The SparkContext checkpoint dir is
    * global state: it is set for the duration of the eager checkpoint
    * and the caller's previous value restored after. */
  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val prior = sc.getCheckpointDir
        sc.setCheckpointDir(s"$dir/graft-ckpt-${java.util.UUID.randomUUID()}")
        try df.checkpoint(eager = true)
        finally prior.foreach(sc.setCheckpointDir)
      case None => df.localCheckpoint(eager = true)
    }
}
