package graft.engine

import graft.operators.Joins
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Thin lazy-DataFrame façade with the reference binding's exact method
  * surface (reference dataframe.rs:30-181), so a user of the reference can
  * switch call-for-call. Each method clones the underlying plan and wraps a
  * new node (same persistent-plan composition as the reference,
  * dataframe.rs:74-111); nothing executes until collect/show — Spark's own
  * laziness, no extra machinery.
  */
final case class GraftFrame(df: DataFrame) {

  /** select_columns(*names) — project by name (dataframe.rs:72-76). */
  def selectColumns(names: String*): GraftFrame =
    GraftFrame(df.select(names.map(df.col): _*))

  /** select(*exprs) — project by expression (dataframe.rs:78-83). */
  def select(exprs: Column*): GraftFrame = GraftFrame(df.select(exprs: _*))

  /** df[key] — single-column access (dataframe.rs:48-65). */
  def apply(name: String): Column = df.col(name)

  /** df[[k1, k2]] — multi-column projection (dataframe.rs:48-65). */
  def apply(names: Seq[String]): GraftFrame =
    GraftFrame(df.select(names.map(df.col): _*))

  /** filter(predicate) (dataframe.rs:85-88). */
  def filter(predicate: Column): GraftFrame = GraftFrame(df.filter(predicate))

  /** with_column(name, expr) (dataframe.rs:90-93). */
  def withColumn(name: String, expr: Column): GraftFrame =
    GraftFrame(df.withColumn(name, expr))

  /** schema() (dataframe.rs:67-70). */
  def schema: StructType = df.schema

  /** aggregate(group_by, aggs) (dataframe.rs:95-100). */
  def aggregate(groupBy: Seq[Column], aggs: Seq[Column]): GraftFrame =
    GraftFrame(
      if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupBy: _*).agg(aggs.head, aggs.tail: _*))

  /** sort(*exprs) (dataframe.rs:102-107) — pair with the sort-key modifiers
    * asc_nulls_first / desc_nulls_last etc. on Column. */
  def sort(exprs: Column*): GraftFrame = GraftFrame(df.orderBy(exprs: _*))

  /** limit(count) (dataframe.rs:109-112; offset is pinned to 0 there). */
  def limit(count: Int): GraftFrame = GraftFrame(df.limit(count))

  /** join(right, join_keys, how) — seven join types (dataframe.rs:132-163). */
  def join(right: GraftFrame, joinKeys: (Seq[String], Seq[String]),
           how: String): GraftFrame =
    GraftFrame(Joins.join(df, right.df, joinKeys._1, joinKeys._2, how))

  /** collect() — triggers distributed execution (dataframe.rs:117-122). */
  def collect(): Array[Row] = df.collect()

  /** collect() as serialized Arrow record batches — the reference's
    * result surface (dataframe.rs:117-130 returns Arrow RecordBatches).
    * IPC wire format, readable by any Arrow implementation; batch sizing
    * follows spark.sql.execution.arrow.maxRecordsPerBatch. */
  def collectArrow(): Array[Array[Byte]] =
    org.apache.spark.sql.graftbridge.ArrowBridge.toBatches(df)

  /** show(num) (dataframe.rs:124-130). */
  def show(num: Int = 20): Unit = df.show(num)

  /** explain(verbose, analyze) (dataframe.rs:165-174). */
  def explain(verbose: Boolean = false, analyze: Boolean = false): Unit =
    Explain.explain(df, verbose, analyze)

  /** explain_string (dataframe.rs:176-181). */
  def explainString(verbose: Boolean = false,
                    analyze: Boolean = false): String =
    Explain.explainString(df, verbose, analyze)
}
