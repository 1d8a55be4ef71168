package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native Catalyst expression for the hot cell-encoding step (north rule: batched,
 * UDF-free): cell_id(lon, lat, level) packs the quadkey cell exactly like
 * graft.cells.CellIndex.cell. Ships real codegen (doGenCode emits straight-line Java
 * that stays inside whole-stage codegen) — the optimization SURVEY.md §7.3 reserves
 * for the genuinely hot scalar kernels; the Column-composed form remains the
 * reference implementation and the two are property-tested equal.
 */
case class CellId(lon: Expression, lat: Expression, level: Expression)
    extends TernaryExpression {

  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = level
  override def dataType: DataType = LongType
  override def nullable: Boolean = lon.nullable || lat.nullable || level.nullable

  @inline private def clamp(v: Double, level: Int): Long = {
    val max = (1L << level) - 1
    val i = math.floor(v).toLong
    if (i < 0L) 0L else if (i > max) max else i
  }

  override protected def nullSafeEval(lonV: Any, latV: Any, levelV: Any): Any = {
    val lvl = levelV.asInstanceOf[Int]
    val ix = clamp((lonV.asInstanceOf[Double] + 180.0) / 360.0 * (1L << lvl), lvl)
    val iy = clamp((latV.asInstanceOf[Double] + 90.0) / 180.0 * (1L << lvl), lvl)
    (lvl.toLong << 58) | (iy << 29) | ix
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lonV, latV, lvlV) => {
      val max = ctx.freshName("max")
      val ix = ctx.freshName("ix")
      val iy = ctx.freshName("iy")
      s"""
         |long $max = (1L << $lvlV) - 1L;
         |long $ix = (long) java.lang.Math.floor(($lonV + 180.0) / 360.0 * (1L << $lvlV));
         |long $iy = (long) java.lang.Math.floor(($latV + 90.0) / 180.0 * (1L << $lvlV));
         |$ix = $ix < 0L ? 0L : ($ix > $max ? $max : $ix);
         |$iy = $iy < 0L ? 0L : ($iy > $max ? $max : $iy);
         |${ev.value} = (((long) $lvlV) << 58) | ($iy << 29) | $ix;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(lon = newFirst, lat = newSecond, level = newThird)
}

object CellId {
  /** Column factory. */
  def cellId(lon: Column, lat: Column, level: Int = graft.cells.CellIndex.DefaultLevel): Column =
    GraftColumn.column(CellId(GraftColumn.expression(lon), GraftColumn.expression(lat),
      GraftColumn.expression(lit(level))))

  /** Register as a SQL function: SELECT cell_id(lon, lat, 11). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cell_id", exprs => CellId(exprs(0), exprs(1), exprs(2)), "built-in")
}
