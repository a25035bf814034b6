package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so `spark.sql` queries can refer to
    * them by name — the Spark analog of the reference's named-table catalog
    * (reference context.rs:110-163). */
  def registerAll(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
}
