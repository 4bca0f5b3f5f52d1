package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Thin SQL facade (SURVEY.md §7.1 item 8): registers the star-schema
  * tables as temp views and executes raw ANSI SQL — the surface a
  * SQL-first user of the engine drives. DataFrame and SQL paths share
  * the same catalog/session semantics (ANSI off, UTC), so results are
  * interchangeable (EngineSpec pins q16/q17 parity).
  */
object Engine {

  /** Register all testdata tables for `sfDir` as temp views. */
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.registerAll(spark, sfDir)

  /** Register + run one SQL query. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
