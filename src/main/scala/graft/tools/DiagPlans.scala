package graft.tools

import graft.core.Session
import graft.queries.Registry

/** Print the formatted physical plan (and optionally run) a set of
  * registry queries — the audit loop behind "iterate until it's the plan
  * you'd want, not the first one that passed".
  *
  * Usage: runMain graft.tools.DiagPlans <sfDir> <queryName>[,<queryName>...]
  */
object DiagPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = Session.local()
    names.foreach { n =>
      val df = Registry.queries(n)(spark, sfDir)
      println(s"\n===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
