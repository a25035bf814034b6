package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}

/** Generic window-function resolver with the reference's single binding
  * `window(name, args, partition_by, order_by)` (reference
  * functions.rs:111-138): any window function — ranking, analytic, or any
  * aggregate used over a window — is resolved *by name*, the Spark analog of
  * DataFusion's `find_df_window_func` (reference functions.rs:119).
  *
  * Frame semantics parity: the reference pins `WindowFrame::new(has_order_by)`
  * (functions.rs:135) — whole partition without ORDER BY, RANGE UNBOUNDED
  * PRECEDING..CURRENT ROW with ORDER BY. Spark's defaults are identical, so
  * no frame plumbing is needed.
  */
object WindowFns {

  def window(name: String,
             args: Seq[Column] = Nil,
             partitionBy: Seq[Column] = Nil,
             orderBy: Seq[Column] = Nil): Column = {
    val spec0: WindowSpec = Window.partitionBy(partitionBy: _*)
    val spec = if (orderBy.nonEmpty) spec0.orderBy(orderBy: _*) else spec0
    resolve(name, args).over(spec)
  }

  /** Name → window/aggregate function, resolved through the session function
    * registry (`call_function`) — the direct analog of DataFusion's
    * name lookup. The registry covers the full ranking/analytic set
    * (row_number, rank, dense_rank, percent_rank, cume_dist, ntile, lag,
    * lead, first_value, last_value, nth_value) and every aggregate usable
    * over a window (sum/avg/min/max/count/stddev/...). */
  private def resolve(name: String, args: Seq[Column]): Column =
    name.toLowerCase match {
      case "count" if args.isEmpty => F.count(F.lit(1))
      case other                   => F.call_function(other, args: _*)
    }
}
