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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true so the
    * column arrives as Long nanoseconds, converted here to a microsecond
    * timestamp (integer `div` — a double division would lose precision on
    * ~1.7e18 ns values). The synthetic data has zero sub-microsecond
    * component, so the conversion is lossless. */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
