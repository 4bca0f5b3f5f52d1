package graft.tools

import graft.core.Session
import graft.queries.Registry

/** Print the formatted physical plan (and optionally run) a set of
  * registry queries — the audit loop behind "iterate until it's the plan
  * you'd want, not the first one that passed".
  *
  * Usage: runMain graft.tools.DiagPlans <sfDir> <queryName>[,...|all] [outFile]
  */
object DiagPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args(1) == "all") Registry.all.map(_.name)
      else args(1).split(",").toSeq
    val out = args.lift(2).map(p => new java.io.PrintWriter(p))
    def emit(s: String): Unit = out.fold(println(s))(_.println(s))
    val exec = sys.env.get("GRAFT_DIAG_EXEC").contains("1")
    val spark = Session.local()
    names.foreach { n =>
      val df = Registry.queries(n)(spark, sfDir)
      emit(s"\n===== $n =====")
      if (exec) {
        // run it, then dump the FINAL adaptive plan — the only place
        // runtime exchange/stage reuse (AQE) is visible
        df.collect()
        emit(df.queryExecution.executedPlan.toString)
      } else
        emit(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    out.foreach(_.close())
    spark.stop()
  }
}
