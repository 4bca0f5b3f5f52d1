package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{Curation, Dedup, Fuzzy, Multimodal, Pca, Pq, QualityClassifier, Similarity, TextOps}

/** One verifiable query: a Spark DataFrame program plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (see SparkEntry): column names/aliases MUST match between
  * `fn`'s output and `oracle` — the driver sorts columns by name before
  * hashing values. Every query ends in a deterministic ORDER BY (or is a
  * global aggregate) so row order is reproducible across engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry of the engine's query surface (SURVEY.md §2B Q01–Q26
  * plus the LLM-pipeline extensions: dedup, similarity, text analysis).
  */
object Registry {
  def all: Seq[Q] =
    Relational.defs ++ Advanced.defs ++ Sessionize.defs ++
      ScaleWindows.defs ++ Frontier.defs ++ Stats.defs ++ Geo.defs ++
      TextOps.defs ++ Dedup.defs ++
      Similarity.defs ++ Multimodal.defs ++ Curation.defs ++ Pq.defs ++
      QualityClassifier.defs ++ Pca.defs ++ Fuzzy.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
