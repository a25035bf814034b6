package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Equi-join façade with the reference's seven join types (reference
  * dataframe.rs:132-163): join on named key columns,
  * `how` ∈ inner|left|right|full|semi|anti|right_semi.
  *
  * Spark-first: delegates to `DataFrame.join` so Catalyst/AQE pick the
  * physical strategy (broadcast / sort-merge / shuffled-hash, plus runtime
  * skew handling). `right_semi` has no Spark join-type string — it is
  * planned as a side-swapped `left_semi`, preserving the right side's
  * columns, exactly the RightSemi semantics (reference dataframe.rs:145).
  */
object Joins {

  private val types =
    Set("inner", "left", "right", "full", "semi", "anti", "right_semi")

  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           how: String): DataFrame = {
    require(leftKeys.length == rightKeys.length,
      s"join key arity mismatch: $leftKeys vs $rightKeys")
    require(types.contains(how),
      s"The join type $how does not exist or is not implemented")

    def cond(l: DataFrame, lks: Seq[String],
             r: DataFrame, rks: Seq[String]): Column =
      lks.zip(rks).map { case (lk, rk) => l(lk) === r(rk) }
        .reduce(_ && _)

    how match {
      case "right_semi" =>
        right.join(left, cond(right, rightKeys, left, leftKeys), "left_semi")
      case "semi" =>
        left.join(right, cond(left, leftKeys, right, rightKeys), "left_semi")
      case "anti" =>
        left.join(right, cond(left, leftKeys, right, rightKeys), "left_anti")
      case t =>
        left.join(right, cond(left, leftKeys, right, rightKeys), t)
    }
  }

  /** Condition-based variant for non-equi conjuncts (the SQL pass-through
    * surface: theta joins reachable via ctx.sql, reference context.rs:166). */
  def joinOn(left: DataFrame, right: DataFrame, condition: Column,
             how: String): DataFrame = {
    require(types.contains(how),
      s"The join type $how does not exist or is not implemented")
    how match {
      case "right_semi" => right.join(left, condition, "left_semi")
      case "semi"       => left.join(right, condition, "left_semi")
      case "anti"       => left.join(right, condition, "left_anti")
      case t            => left.join(right, condition, t)
    }
  }

  /** Cross join (SQL pass-through surface). */
  def crossJoin(left: DataFrame, right: DataFrame): DataFrame =
    left.crossJoin(right)
}
