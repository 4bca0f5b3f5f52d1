package graft.core

/** Root for query-written artifact stores (PQ/k-means codebooks, PCA
  * components, classifier weights) that the paired DuckDB oracle
  * re-reads from the SAME path. The path must be a constant within a
  * JVM — the oracle SQL strings are generated once per process and the
  * driver replays them after the Spark run — but test JVMs override it
  * (build.sbt: `Test / javaOptions += -Dgraft.artifact.root=...`) so a
  * `sbt test` running beside a Verify/Bench process can never clobber
  * the artifacts that process's oracles are about to read.
  */
object Artifacts {
  val root: String =
    sys.props.getOrElse("graft.artifact.root", "/tmp")
  def dir(name: String): String = s"$root/$name"
}
