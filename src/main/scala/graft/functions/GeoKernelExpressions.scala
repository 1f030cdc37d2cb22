package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Try

/** Native Catalyst expressions for the hot geospatial scalar kernels —
  * the SURVEY §7.5 promotion of the `GeoFunctions` UDF chain, done on
  * round-1 evidence (scalar UDF nodes were the only non-codegen links in
  * the geo query plans; each call paid CatalystTypeConverters boxing for
  * what is one JTS/closed-form math call per row).
  *
  * Design: each expression's `doGenCode` emits a call to a compiled
  * helper in [[GeoKernelExpressions]] (the LshBandKeys pattern), so the
  * surrounding operators stay inside whole-stage codegen and the kernel
  * itself runs as JIT-compiled JVM code with no converter layer. The
  * helpers delegate to the SAME `GeoFunctions`/`CrsTransform` scalar
  * methods the UDFs used — results are bit-identical, so oracle hashes
  * are unchanged.
  *
  * Null/error semantics preserved exactly: NULL in → NULL out, and
  * invalid WKB/WKT/unsupported math parses to NULL (the reference's
  * `safe_geom_from_text` contract, geo_strategy.rs:373-381).
  */
object GeoKernelExpressions {

  private val Helper = "graft.functions.GeoKernelExpressions$.MODULE$"

  // ---- compiled per-row helpers (called from generated code) ----

  def pointWkt(x: Double, y: Double): UTF8String =
    UTF8String.fromString(GeoFunctions.toWkt2D(GeoFunctions.point(x, y)))

  def pointTransformWkt(x: Double, y: Double, src: Int, dst: Int): UTF8String =
    Try {
      val (tx, ty) = CrsTransform.transform(x, y, src, dst)
      UTF8String.fromString(GeoFunctions.toWkt2D(GeoFunctions.point(tx, ty)))
    }.getOrElse(null)

  def asTextFromWkb(b: Array[Byte]): UTF8String =
    GeoFunctions.parseWkb(b)
      .map(g => UTF8String.fromString(GeoFunctions.toWkt2D(GeoFunctions.force2D(g))))
      .orNull

  def asTextFromWkt(s: UTF8String): UTF8String =
    GeoFunctions.parseWkt(s.toString)
      .map(g => UTF8String.fromString(GeoFunctions.toWkt2D(GeoFunctions.force2D(g))))
      .orNull

  def asTextFromHexWkb(s: UTF8String): UTF8String =
    GeoFunctions.parseHexWkb(s.toString)
      .map(g => UTF8String.fromString(GeoFunctions.toWkt2D(GeoFunctions.force2D(g))))
      .orNull

  def transformWkbToWkt(b: Array[Byte], src: Int, dst: Int): UTF8String =
    GeoFunctions.parseWkb(b).flatMap(g => Try(UTF8String.fromString(
      GeoFunctions.toWkt2D(GeoFunctions.force2D(
        GeoFunctions.transformGeom(g, src, dst))))).toOption).orNull

  def transformWktToWkt(s: UTF8String, src: Int, dst: Int): UTF8String =
    GeoFunctions.parseWkt(s.toString).flatMap(g => Try(UTF8String.fromString(
      GeoFunctions.toWkt2D(GeoFunctions.force2D(
        GeoFunctions.transformGeom(g, src, dst))))).toOption).orNull

  def centroidFromWkt(s: UTF8String, axisX: Boolean): java.lang.Double =
    GeoFunctions.parseWkt(s.toString)
      .map(g => java.lang.Double.valueOf(
        if (axisX) g.getCentroid.getX else g.getCentroid.getY))
      .orNull

  def inferCrs(xmn: Double, xmx: Double, ymn: Double, ymx: Double): UTF8String =
    UTF8String.fromString(CrsInference.inferCrsFromRanges(xmn, xmx, ymn, ymx))

  // ---- expressions ----
  //
  // All expressions mix in ImplicitCastInputTypes so the analyzer's
  // ImplicitTypeCasts rule coerces compatible literals — `st_point_wkt(1,
  // 2)` through GraftExtensions now analyzes exactly like the registered
  // UDF surface (which coerces via ScalaUDF input encoders) instead of
  // failing the strict type check the UDF surface would have accepted.

  /** `ST_AsText(ST_Force2D(ST_Point(x, y)))` (geo_strategy.rs:322-331). */
  case class StPointWkt(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType = StringType
    override def nullSafeEval(x: Any, y: Any): Any =
      pointWkt(x.asInstanceOf[Double], y.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $Helper.pointWkt($x, $y);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StPointWkt =
      copy(left = l, right = r)
    override def prettyName: String = "st_point_wkt"
  }

  /** Coordinate pair + reprojection (geo_strategy.rs:333-340); NULL when
    * the transform has no closed form for the pair. */
  case class StPointTransformWkt(left: Expression, right: Expression,
      srcEpsg: Int, dstEpsg: Int) extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(x: Any, y: Any): Any =
      pointTransformWkt(x.asInstanceOf[Double], y.asInstanceOf[Double], srcEpsg, dstEpsg)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("wkt")
      nullSafeCodeGen(ctx, ev, (x, y) => s"""
        |UTF8String $r = $Helper.pointTransformWkt($x, $y, $srcEpsg, $dstEpsg);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StPointTransformWkt =
      copy(left = l, right = r)
    override def prettyName: String = "st_point_transform_wkt"
  }

  /** Shared shape for the five one-argument parse/transform kernels.
    * No constructor parameters: Java deserialization on executors invokes
    * the no-arg constructor of the closest non-serializable ancestor,
    * which this abstract class is (only the concrete case classes get
    * Serializable synthesized). */
  abstract class UnaryGeoText extends UnaryExpression with ImplicitCastInputTypes {
    protected def inType: DataType
    override def inputTypes: Seq[DataType] = Seq(inType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    /** Emitted helper invocation for codegen, e.g. `"asTextFromWkb($c)"`. */
    protected def helperCall(c: String): String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("wkt")
      nullSafeCodeGen(ctx, ev, c => s"""
        |UTF8String $r = $Helper.${helperCall(c)};
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
    }
  }

  /** WKB bytes → 2D WKT (NULL on parse failure). */
  case class StAsTextFromWkb(child: Expression) extends UnaryGeoText {
    override protected def inType: DataType = BinaryType
    override def nullSafeEval(b: Any): Any = asTextFromWkb(b.asInstanceOf[Array[Byte]])
    override protected def helperCall(c: String): String = s"asTextFromWkb($c)"
    override protected def withNewChildInternal(c: Expression): StAsTextFromWkb = copy(child = c)
    override def prettyName: String = "st_astext_wkb"
  }

  /** WKT → normalized 2D WKT. */
  case class StAsTextFromWkt(child: Expression) extends UnaryGeoText {
    override protected def inType: DataType = StringType
    override def nullSafeEval(s: Any): Any = asTextFromWkt(s.asInstanceOf[UTF8String])
    override protected def helperCall(c: String): String = s"asTextFromWkt($c)"
    override protected def withNewChildInternal(c: Expression): StAsTextFromWkt = copy(child = c)
    override def prettyName: String = "st_astext_wkt"
  }

  /** hex-WKB text → 2D WKT. */
  case class StAsTextFromHexWkb(child: Expression) extends UnaryGeoText {
    override protected def inType: DataType = StringType
    override def nullSafeEval(s: Any): Any = asTextFromHexWkb(s.asInstanceOf[UTF8String])
    override protected def helperCall(c: String): String = s"asTextFromHexWkb($c)"
    override protected def withNewChildInternal(c: Expression): StAsTextFromHexWkb = copy(child = c)
    override def prettyName: String = "st_astext_hexwkb"
  }

  /** WKB in, reproject, 2D WKT out (geo_strategy.rs:286-291). */
  case class StTransformWkbToWkt(child: Expression, srcEpsg: Int, dstEpsg: Int)
      extends UnaryGeoText {
    override protected def inType: DataType = BinaryType
    override def nullSafeEval(b: Any): Any =
      transformWkbToWkt(b.asInstanceOf[Array[Byte]], srcEpsg, dstEpsg)
    override protected def helperCall(c: String): String =
      s"transformWkbToWkt($c, $srcEpsg, $dstEpsg)"
    override protected def withNewChildInternal(c: Expression): StTransformWkbToWkt = copy(child = c)
    override def prettyName: String = "st_transform_wkb_wkt"
  }

  case class StTransformWktToWkt(child: Expression, srcEpsg: Int, dstEpsg: Int)
      extends UnaryGeoText {
    override protected def inType: DataType = StringType
    override def nullSafeEval(s: Any): Any =
      transformWktToWkt(s.asInstanceOf[UTF8String], srcEpsg, dstEpsg)
    override protected def helperCall(c: String): String =
      s"transformWktToWkt($c, $srcEpsg, $dstEpsg)"
    override protected def withNewChildInternal(c: Expression): StTransformWktToWkt = copy(child = c)
    override def prettyName: String = "st_transform_wkt_wkt"
  }

  /** Centroid X or Y of a WKT geometry (NULL on parse failure). */
  case class CentroidFromWkt(child: Expression, axisX: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(s: Any): Any =
      centroidFromWkt(s.asInstanceOf[UTF8String], axisX)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("cxy")
      nullSafeCodeGen(ctx, ev, c => s"""
        |java.lang.Double $r = $Helper.centroidFromWkt($c, $axisX);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin)
    }
    override protected def withNewChildInternal(c: Expression): CentroidFromWkt = copy(child = c)
    override def prettyName: String = if (axisX) "st_centroid_x_wkt" else "st_centroid_y_wkt"
  }

  /** Spherical Web-Mercator per-axis forward/inverse — pure inline math
    * (identical operation sequence to [[CrsTransform]]'s scalar forms). */
  case class WebMercatorAxis(child: Expression, axisX: Boolean, forward: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(DoubleType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val d = v.asInstanceOf[Double]
      (forward, axisX) match {
        case (true, true)   => CrsTransform.mercX(d)
        case (true, false)  => CrsTransform.mercY(d)
        case (false, true)  => CrsTransform.invMercLon(d)
        case (false, false) => CrsTransform.invMercLat(d)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val helper = "graft.functions.CrsTransform$.MODULE$"
      val m = (forward, axisX) match {
        case (true, true)   => "mercX"
        case (true, false)  => "mercY"
        case (false, true)  => "invMercLon"
        case (false, false) => "invMercLat"
      }
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.$m($c);")
    }
    override protected def withNewChildInternal(c: Expression): WebMercatorAxis = copy(child = c)
    override def prettyName: String =
      (if (forward) "merc_" else "inv_merc_") + (if (axisX) "x" else "y")
  }

  /** CRS classification from coordinate ranges (geo_strategy.rs:228-253). */
  case class InferCrs(children: Seq[Expression]) extends Expression
      with ImplicitCastInputTypes {
    require(children.length == 4, "infer_crs(xmn, xmx, ymn, ymx)")
    override def inputTypes: Seq[DataType] = Seq.fill(4)(DoubleType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = children.exists(_.nullable)
    override def foldable: Boolean = children.forall(_.foldable)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else inferCrs(vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
        vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val evals = children.map(_.genCode(ctx))
      val anyNull = evals.map(_.isNull).mkString(" || ")
      val args = evals.map(_.value).mkString(", ")
      val childCode = evals.map(_.code).reduce(_ + _)
      ev.copy(code =
        code"""
          |$childCode
          |boolean ${ev.isNull} = $anyNull;
          |UTF8String ${ev.value} = null;
          |if (!${ev.isNull}) { ${ev.value} = $Helper.inferCrs($args); }
         """.stripMargin)
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): InferCrs = copy(children = cs)
    override def prettyName: String = "infer_crs"
  }
}
