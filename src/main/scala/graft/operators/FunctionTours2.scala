package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Second scalar/window function tour (SURVEY.md §2.2 families, breadth
  * beyond ScalarTours): window navigation, extended string ops, trig and
  * bit math. Parity notes per query.
  *
  * Reference capability: pandas window/string/math accessors via the deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object FunctionTours2 {

  /** Window navigation: first/last/nth value + distribution ranks.
    * percent_rank/cume_dist are exact rationals of integer counts —
    * bit-identical across engines unrounded. */
  val qWindowNav: Q = Q(
    "q76_window_navigation",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_ok,
      |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
      |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(wFull).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Extended string ops: split_part / instr / repeat / translate /
    * left / right. All 1-based, identical semantics both engines. */
  val qStringsExtra: Q = Q(
    "q77_string_functions_2",
    """SELECT c_custkey,
      |  split_part(c_name, '#', 1) AS name_part,
      |  CAST(instr(c_name, 'er') AS BIGINT) AS er_pos,
      |  repeat(c_mktsegment, 2) AS seg2,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
      |  left(c_name, 4) AS l4, right(c_name, 4) AS r4
      |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        split_part(col("c_name"), lit("#"), lit(1)).as("name_part"),
        instr(col("c_name"), "er").cast("long").as("er_pos"),
        repeat(col("c_mktsegment"), 2).as("seg2"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lowvowel"),
        substring(col("c_name"), 1, 4).as("l4"),
        expr("right(c_name, 4)").as("r4"))
      .orderBy(col("c_custkey"))
  }

  /** Trig / roots / logs and bit operations. Trig results are identical
    * doubles (same libm-definable functions on identical inputs) but
    * rounded to 6 to be safe across math libraries; bit ops are exact. */
  val qMathBit: Q = Q(
    "q78_math_trig_bits",
    """SELECT l_orderkey, l_linenumber,
      |  round(sin(l_discount), 6) AS s, round(cos(l_discount), 6) AS c,
      |  round(atan2(l_discount, l_tax + 0.01), 6) AS at2,
      |  round(log10(l_extendedprice), 6) AS lg10,
      |  round(cbrt(l_quantity), 6) AS cb,
      |  round(degrees(l_discount), 6) AS deg,
      |  CAST(l_quantity AS BIGINT) & 12 AS band,
      |  CAST(l_quantity AS BIGINT) | 3 AS bor,
      |  xor(CAST(l_quantity AS BIGINT), 21) AS bxor,
      |  CAST(l_quantity AS BIGINT) << 2 AS shl
      |FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val q = col("l_quantity").cast("long")
    Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sin(col("l_discount")), 6).as("s"),
        round(cos(col("l_discount")), 6).as("c"),
        round(atan2(col("l_discount"), col("l_tax") + 0.01), 6).as("at2"),
        round(log10(col("l_extendedprice")), 6).as("lg10"),
        round(cbrt(col("l_quantity")), 6).as("cb"),
        round(degrees(col("l_discount")), 6).as("deg"),
        q.bitwiseAND(lit(12L)).as("band"),
        q.bitwiseOR(lit(3L)).as("bor"),
        q.bitwiseXOR(lit(21L)).as("bxor"),
        shiftleft(q, 2).as("shl"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val all: Seq[Q] = Seq(qWindowNav, qStringsExtra, qMathBit)
}
