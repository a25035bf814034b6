package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver-provided star schema (TESTDATA.md): one parquet
  * file per table under `dir`. Mirrors the reference's file-backed external
  * tables (reference context.rs:100-163) — every query starts from a
  * declarative parquet scan so Catalyst gets pushdown + pruning for free.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others;
    * normalize both to a session-zoned TimestampType column (sessions pin
    * UTC) so downstream µs arithmetic (unix_micros, date_bin) always
    * resolves.
    *  - NANOS + spark.sql.legacy.parquet.nanosAsLong=true → LongType ns,
    *    converted with integer `div` (a double division would lose
    *    precision on ~1.7e18 ns values); the synthetic data has zero
    *    sub-microsecond component, so this is lossless.
    *  - MICROS naive → TIMESTAMP_NTZ under Spark's default NTZ inference;
    *    cast to TimestampType reinterprets the same wall-clock instant in
    *    the UTC session zone — lossless and identical to what the DuckDB
    *    oracle reads. */
  def events: DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so `spark.sql` queries can refer to
    * them by name — the Spark analog of the reference's named-table catalog
    * (reference context.rs:110-163). */
  def registerAll(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}
