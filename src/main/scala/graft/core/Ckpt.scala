package graft.core

import org.apache.spark.sql.DataFrame

/** The q177/q241 zero-persisted-RDD-delta discipline, packaged: a
  * query that localCheckpoints a reused intermediate must RELEASE the
  * blocks before returning (Bench fails leaks loud, and an unreleased
  * block taxes every query behind it — the r9 pageRank lesson), but
  * the blocks can only go once nothing downstream still needs them —
  * so the (summary-sized) result lands on a RELIABLE checkpoint
  * first, then the local blocks drop.
  */
object Ckpt {

  /** Eagerly reliable-checkpoint `result`, then unpersist each of
    * `locals`' localCheckpoint blocks. Returns the checkpointed
    * result (a file-backed scan — nothing persisted in the block
    * manager). `result` should be summary-sized relative to the
    * inputs: its one materialization here IS the query's execution
    * (callers' writes re-read the checkpoint files, not the lineage).
    */
  def releaseAfter(result: DataFrame, locals: DataFrame*): DataFrame = {
    val sc = result.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("graft-ckpt").toString)
    val out = result.checkpoint(eager = true)
    locals.foreach { df =>
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))
    }
    out
  }
}
