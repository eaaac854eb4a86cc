package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels for the embedding hot path.
  *
  * Why they exist: the HOF formulation of PQ assignment is m·k nested
  * `aggregate(zip_with(...))` lambda trees inside a `least(struct(...))`
  * per subspace — 128 generated lambda aggregates whose whole-stage
  * code takes seconds to COMPILE at any data size (q_embed_pq and
  * q_sim_ann_ivfpq were the two slowest bench rows purely on codegen
  * compile cost). Each kernel is one flat loop referencing the codebooks
  * as a plan object; PqSpec pins bit-equality against the HOF forms.
  *
  * Semantics pinned to the replaced expressions exactly: per subspace j,
  * dist(c) = Σ_i (v[j·dsub+i] − books[j][c][i])² accumulated left to
  * right (zip_with/aggregate association); winner = min dist with ties
  * to the SMALLEST code (strict `<`, matching least(struct(dist, code))
  * on distinct-code structs); total err = Σ_j dist_j in subspace order.
  */
object PqKernels {

  /** (codes LONG[m], total squared error) of one vector. */
  def pqCodes(v: ArrayData, books: Array[Array[Array[Double]]]): InternalRow = {
    val m = books.length
    val arr = v.toDoubleArray()
    val codes = new Array[Long](m)
    var err = 0.0
    var j = 0
    var off = 0
    while (j < m) {
      val cents = books(j)
      val dsub = cents(0).length
      if (off + dsub > arr.length) throw new IllegalArgumentException(
        s"pq_codes: vector dim ${arr.length} shorter than codebook span")
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val t = arr(off + i) - cv(i); dist += t * t; i += 1
        }
        // strict < keeps the FIRST (= smallest code) on exact ties —
        // least(struct(dist, code)) semantics for distinct codes
        if (dist < bestDist) { best = c; bestDist = dist }
        c += 1
      }
      codes(j) = best.toLong
      err += bestDist
      off += dsub
      j += 1
    }
    if (off != arr.length) throw new IllegalArgumentException(
      s"pq_codes: vector dim ${arr.length} does not match codebook span $off")
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err))
  }

  /** ADC: exact probe subvectors vs the candidate's RECONSTRUCTED
    * centroids selected by its codes. */
  def adcDistance(v: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Double]]]): Double = {
    val m = books.length
    val arr = v.toDoubleArray()
    var total = 0.0
    var j = 0
    var off = 0
    while (j < m) {
      val cv = books(j)(codes.getLong(j).toInt)
      val dsub = cv.length
      if (off + dsub > arr.length) throw new IllegalArgumentException(
        s"adc_distance: vector dim ${arr.length} shorter than codebook span")
      var dist = 0.0
      var i = 0
      while (i < dsub) { val t = arr(off + i) - cv(i); dist += t * t; i += 1 }
      total += dist
      off += dsub
      j += 1
    }
    if (off != arr.length) throw new IllegalArgumentException(
      s"adc_distance: vector dim ${arr.length} does not match codebook span $off")
    total
  }
}

/** struct(codes ARRAY<BIGINT>, err DOUBLE): per-subspace PQ codes + total
  * squared reconstruction error in ONE loop over the vector. */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(b => b.nonEmpty &&
    b.forall(_.length == b(0).length)), "ragged PQ codebooks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))

  override def prettyName: String = "pq_codes"

  override def nullSafeEval(v: Any): Any =
    PqKernels.pqCodes(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PqKernels.pqCodes($v, $bRef)")
  }

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

/** DOUBLE: asymmetric PQ distance between an exact probe vector (left)
  * and a candidate's code array (right). */
case class AdcDistance(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<DOUBLE>, ARRAY<BIGINT>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_distance"

  override def nullSafeEval(v: Any, codes: Any): Any =
    PqKernels.adcDistance(v.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqKernels.adcDistance($v, $c, $bRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object PqFns {
  import org.apache.spark.sql.graftbridge.Bridge

  def pqCodes(v: Column, books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqCodes(Bridge.expression(v), books))

  def adcDistance(v: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column =
    Bridge.column(AdcDistance(Bridge.expression(v), Bridge.expression(codes), books))
}
