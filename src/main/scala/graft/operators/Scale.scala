package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tooling for the 100 TB deployment shape: skew-salted joins and
  * bucketed co-located joins. AQE's runtime skew-join splitting handles
  * moderate skew automatically; these are the explicit knobs for the cases
  * the planner can't see (pre-known hot keys, reused join keys across many
  * queries).
  */
object Scale {

  /** Skew-salted equi-join: the big (skewed) side gets a deterministic salt
    * in [0, salts); the small side is replicated once per salt value. The
    * shuffle key becomes (key, salt), splitting each hot key's row group
    * across `salts` reducers. Semantics identical to
    * `big.join(small, keys, "inner")` for 1:N joins (small side unique on
    * its key — the usual dim-table shape).
    *
    * Deterministic salt (hash of the whole big-side row) rather than rand():
    * reruns and retried tasks produce identical partitioning, which keeps
    * shuffle outputs reusable. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Write a DataFrame as a bucketed+sorted table: co-locates future joins
    * and aggregations on `bucketCols` — two tables bucketed the same way
    * join with ZERO shuffle (Spark reads bucket files as pre-partitioned
    * input splits). This is the reference's `ballista.repartition.joins`
    * answer done ahead of time, amortized across every query that reuses
    * the key. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketed co-location actually removed the shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
