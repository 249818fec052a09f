package graft.functions

import org.apache.spark.sql.{Column, GraftInternals}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The pair-verification stage of embedding near-dup dedupe evaluates one
  * dot per candidate pair; a Scala UDF pays a boxed `Seq[Double]` conversion
  * per side per call (~16 µs/pair measured — the whole cost of the operator
  * at bench scale, and a linear-factor drag at 10^9 pairs). This expression
  * participates in whole-stage codegen and reads the unsafe array buffers
  * directly — no allocation per row.
  *
  * The accumulation is the same ascending-index IEEE left fold as the UDF it
  * replaces and as DuckDB's `list_reduce(list_transform(...))`, so results
  * stay bit-identical to the oracle (MEMORY: oracle-parity ordered folds).
  *
  * Contract (ADVICE r4): mismatched-length arrays yield NULL — an upstream
  * dimensionality bug must not become a plausible-looking similarity (the
  * UDF this replaced threw; null keeps the expression total while still
  * failing every downstream threshold). PRECONDITION: no null elements
  * inside the arrays (unit-normalized embedding vectors; `getDouble` on a
  * null slot would read garbage) — a null ARRAY yields null via the
  * null-safe wrapper.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // null is produced for mismatched lengths even when both inputs are
  // non-null, so nullability cannot be inherited from the children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_array_dot needs two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

/** All `bands` sign-LSH band keys of a vector in ONE pass over the elements.
  *
  * Band t's key packs the signs of hyperplanes t*rowsPerBand .. t*rowsPerBand
  * + rowsPerBand-1 (bit j = sign of the dot with plane t*rowsPerBand+j) — the
  * same deterministic plane family as `Ann.signBucket`
  * ([[VectorOps.planeWeightScalar]]), so band 0 at rowsPerBand = nbits IS the
  * single-table bucket. Evaluating the L*b planes through the Catalyst
  * higher-order-function path costs one zip_with array materialization per
  * plane per row; this expression accumulates every plane dot in a single
  * whole-stage-codegen loop over the vector, reading the (dim-memoized)
  * static weight matrix instead of re-deriving the mix per cell — at 10^9
  * rows x 56 planes x d dims the inline derivation would be ~5 integer ops
  * per cell of pure overhead.
  *
  * Each plane dot is the ascending-index IEEE left fold of
  * `v[i] * weight(p, i)` — bit-identical to `aggregate(zip_with(...))` and
  * to the oracle's `list_reduce(list_transform(...))` (MEMORY:
  * oracle-parity ordered folds). Input element type float or double; a null
  * array yields null; null ELEMENTS are not expected (same precondition as
  * [[DoubleArrayDot]]).
  */
case class SignBands(child: Expression, bands: Int, rowsPerBand: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(t, _) => t == org.apache.spark.sql.types.FloatType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _)
      if t == DoubleType || t == org.apache.spark.sql.types.FloatType =>
      if (bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 62) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sign_bands needs bands >= 1 and 1 <= rowsPerBand <= 62, got ($bands, $rowsPerBand)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands needs an array<float|double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "sign_bands"

  // weight matrix memo, plane-major ([p * dim + i]); embeddings have one
  // dim per table, so a single-entry memo hits every row after the first.
  // ONE immutable (dim, weights) pair behind a single @volatile field
  // (ADVICE r5): the old two-field memo (memoW then memoDim, non-volatile)
  // could pair a fresh dim with another dim's array under a shared-instance
  // race on ragged-dim input — silently wrong band keys. Publishing the
  // tuple atomically makes the race benign again (concurrent builds
  // produce identical arrays; last write wins).
  @transient @volatile private var memo: (Int, Array[Double]) = _

  /** Static plane-weight matrix for vectors of `dim` elements (public to
    * the generated code via addReferenceObj). */
  def weights(dim: Int): Array[Double] = {
    val m = memo
    if (m != null && m._1 == dim) return m._2
    val np = bands * rowsPerBand
    val w = new Array[Double](np * dim)
    var p = 0
    while (p < np) {
      var i = 0
      while (i < dim) {
        w(p * dim + i) = VectorOps.planeWeightScalar(p, i)
        i += 1
      }
      p += 1
    }
    memo = (dim, w)
    w
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val np = bands * rowsPerBand
    val dots = new Array[Double](np)
    val wm = weights(n)
    val isF = elemIsFloat
    var i = 0
    while (i < n) {
      val xi = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      var p = 0
      while (p < np) {
        dots(p) += xi * wm(p * n + i)
        p += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        if (dots(t * rowsPerBand + j) > 0) key |= (1L << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val w = bands * rowsPerBand
      val ref = ctx.addReferenceObj("signBands", this, classOf[SignBands].getName)
      val n = ctx.freshName("n")
      val wm = ctx.freshName("wm")
      val dots = ctx.freshName("dots")
      val keys = ctx.freshName("keys")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val key = ctx.freshName("key")
      val getElem = if (elemIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |double[] $wm = $ref.weights($n);
         |double[] $dots = new double[$w];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getElem;
         |  for (int $p = 0; $p < $w; $p++) {
         |    $dots[$p] += $xi * $wm[$p * $n + $i];
         |  }
         |}
         |long[] $keys = new long[$bands];
         |for (int $t = 0; $t < $bands; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    if ($dots[$t * $rowsPerBand + $j] > 0) $key |= (1L << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object VectorOps {
  /** Deterministic pseudo-random hyperplane weight for (plane `bit`,
    * coordinate `dim`): integer in [-999, 999], the single source of truth
    * for the sign-LSH plane family ([[SignBands]], `Ann.signBucket`, and
    * the DuckDB oracle mirror `SparkEntry.duckPlaneWeight` all emit exactly
    * this arithmetic; every intermediate fits a signed 64-bit integer and
    * all `%` operands are non-negative, so remainder semantics agree across
    * engines).
    *
    * The mix squares twice to break linearity. The original single-LCG
    * weight `(bit*A + dim*B) % 2001 - 1000` had B = 19349663 ≡ -7
    * (mod 2001): every plane was a near-arithmetic ramp, planes were
    * near-PARALLEL (measured mean inter-plane |cos| 0.88, some exactly
    * 1.0), 20-bit sign buckets collapsed to ~76 distinct keys over 2*10^5
    * vectors (the all-pairs blowup `Dedup.deriveNbits` exists to prevent),
    * and banded recall froze at ~0.83 vs the 0.92 independence theory.
    * Double-squaring mod the prime 100003 is statistically
    * indistinguishable from i.i.d. Gaussian planes (mean |cos| 0.199 vs
    * random 0.203 at dim 16; max 20-bit bucket 112 vs 2033 for a single
    * square) — validated by VectorOpsSpec's planted-pair recall spec. */
  def planeWeightScalar(bit: Int, dim: Int): Double = {
    val s = (bit.toLong * 73856093L + dim.toLong * 19349663L) % 100003L
    val t = (s * s + bit.toLong) % 100003L
    ((t * t) % 100003L % 1999L - 999L).toDouble
  }

  /** Codegen'd `sum_i a[i]*b[i]` over two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    GraftInternals.toColumn(DoubleArrayDot(GraftInternals.toExpr(a), GraftInternals.toExpr(b)))

  /** Codegen'd sign-LSH band keys: `array<bigint>` of length `bands`, band t
    * keyed by the signs of hyperplanes t*rowsPerBand..t*rowsPerBand+rows-1
    * (one pass over the vector for all bands — see [[SignBands]]). */
  def signBands(vec: Column, bands: Int, rowsPerBand: Int): Column =
    GraftInternals.toColumn(SignBands(GraftInternals.toExpr(vec), bands, rowsPerBand))
}
