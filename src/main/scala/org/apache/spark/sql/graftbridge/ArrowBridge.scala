package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's private[sql] Arrow collection path — the reference's
  * `collect()` returns Arrow RecordBatches (reference dataframe.rs:117-130),
  * and Spark's own Arrow conversion (`Dataset.toArrowBatchRdd`,
  * `ArrowConverters`) is private[sql]. Same shim technique as
  * [[ColumnBridge]]: declared under org.apache.spark.sql so the members
  * resolve. Batches use the Arrow IPC record-batch wire format — the bytes
  * interoperate with any Arrow reader (pyarrow, arrow-rs, Arrow Java).
  */
object ArrowBridge {

  /** Execute and collect as serialized Arrow record batches (one byte
    * array per produced batch; batch size governed by
    * spark.sql.execution.arrow.maxRecordsPerBatch). */
  def toBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .toArrowBatchRdd.collect()

  /** Deserialize Arrow record batches back to external Rows — the inverse
    * used to prove lossless round trips (and to hand batch consumers a
    * row view without re-executing the query). */
  def fromBatches(spark: SparkSession, schema: StructType,
                  batches: Iterator[Array[Byte]]): Iterator[Row] = {
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val internal = ArrowConverters.fromBatchIterator(batches, schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false,
      context = null)
    val toScala = CatalystTypeConverters.createToScalaConverter(schema)
    internal.map(ir => toScala(ir).asInstanceOf[Row])
  }
}
