package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: a named query is a function of (session, sfDir). */
  type Q = (SparkSession, String) => DataFrame

  /** A query suite pairs DataFrame-API queries with DuckDB oracle SQL.
    * Queries with no SQL-expressible oracle simply have no `oracle` entry
    * (the driver then records a weaker rows-only check). */
  trait Suite {
    def defs: Map[String, Q]
    def oracle: Map[String, String]
  }
}
