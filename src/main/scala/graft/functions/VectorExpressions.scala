package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Custom Catalyst expression for the one hot-path Spark's built-ins can't
  * express efficiently (SURVEY.md §7.3 tier (b)): the float-vector dot
  * product.
  *
  * The higher-order-function formulation
  * (`aggregate(sequence(0,63), …)`) is CodegenFallback — every element
  * step is an interpreted lambda call with boxing. This expression is a
  * tight codegen'd loop over the two `ArrayData`s, accumulating in double
  * with the same left-to-right order as the fold (and as the DuckDB
  * oracle), so results stay bit-identical while the inner loop becomes
  * branch-free Java.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Null also arises from malformed input (length mismatch, null element),
  // not just null children.
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Match the fold/oracle semantics on malformed rows: a length
    // mismatch or a null element yields NULL, never a partial sum.
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Double sibling of [[FloatVectorDot]] for trained-weight vectors:
  * `double_dot(array<double>, array<double>) → double`, replacing the
  * interpreted `aggregate(sequence(0, d-1), 0D, (acc, j) ->
  * acc + wv[j] * x[j])` linear-scorer fold (per-ROW over the corpus in
  * the quality-model family — CodegenFallback). Identical left-to-right
  * accumulation, so scores and every oracle hash downstream are
  * unchanged (VectorExpressionsSpec pins it). Length mismatch or null
  * element yields NULL where the ANSI fold would throw on the
  * out-of-range index — the float_l2_sub deviation; callers feed
  * equal-length weight/feature arrays.
  */
case class DoubleVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"double_dot requires two array<double> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Integer sibling of [[FloatVectorDot]] for quantized vectors:
  * `long_dot(array<bigint>, array<bigint>) → bigint`, a tight codegen'd
  * multiply-accumulate replacing the interpreted `aggregate(zip_with(…))`
  * fold in the int8 similarity hot loop (per-pair work in
  * `graft.queries.Similarity.simSqInt8`; higher-order functions run
  * interpreted — CodegenFallback — so hot loops get codegen'd
  * expressions).
  * Exact long arithmetic end to end; int8-quantized 64-dim inputs peak at
  * |acc| ≤ 127²·64 ≈ 10⁶, astronomically under overflow (callers with
  * wider inputs inherit Java wrap-around, same as the SQL fold under
  * non-ANSI — documented, not checked, to keep the loop branch-free).
  * Length mismatch or null element yields NULL, never a partial sum.
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a pre-hashed token array: bit b of the result is set
  * iff the count of inputs with bit b set exceeds the count without. Same
  * semantics as the higher-order-function formulation in
  * `graft.queries.Text.ddSimhash`, but as one codegen'd loop instead of
  * 64 × |tokens| interpreted lambda steps. Null input or a null element
  * yields null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counters = ctx.freshName("counters")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $counters = new int[64];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counters[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($counters[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Squared-L2 sibling of [[FloatVectorDot]] for quantization-error audits:
  * `float_l2(array<float>, array<double>) → double` — the vector-to-
  * centroid squared distance `sum_i (v[i] - c[i])²`, accumulated in
  * double in index order with each element's difference computed exactly
  * like the interpreted fold (`(CAST(v[i] AS DOUBLE) - c[i])²`) and the
  * DuckDB oracle, so results stay bit-identical while the 64-dim inner
  * loop becomes branch-free Java (VERDICT r8 item 7: sim_ivf_drift's
  * cost was dominated by the interpreted fold). The right side is the
  * centroid (double) — asymmetric types are the actual call shape, a
  * cast-to-double of the float side inside the loop, never a cast of
  * the arrays. Length mismatch or null element yields NULL, never a
  * partial sum.
  */
case class FloatDoubleL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_l2 requires (array<float>, array<double>), got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "float_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleL2 =
    copy(left = newLeft, right = newRight)
}

/** Normalized 64×64 Hadamard rotation `out[i] = Σⱼ (−1)^popcount(i&j) ·
  * v[j] / 8.0` — the OPQ rotation hot loop (Ge et al. 2013; the
  * deterministic rotation `graft.queries.Similarity.opqRotExpr` applies
  * before every PQ train/encode in rotated space). The higher-order
  * formulation is CodegenFallback: 64 interpreted lambda folds of 64
  * steps PER ROW (the r15 plan audit's "codegen'd Expression slot" —
  * VERDICT r15 item 3). This is the same arithmetic as one tight
  * codegen'd loop: accumulate ±v[j] in j order in double, divide once by
  * 8.0 — bit-identical to the fold and to the DuckDB twin
  * (VectorExpressionsSpec pins equality against the interpreted text).
  * Locked to 64 dims (the /8 = √64 normalization is dimension-bound);
  * any other length, a null input or a null element yields NULL.
  */
case class Hadamard64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hadamard64 requires an array<double> argument, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "hadamard64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != 64) return null
    val v = new Array[Double](64)
    var j = 0
    while (j < 64) {
      if (x.isNullAt(j)) return null
      v(j) = x.getDouble(j)
      j += 1
    }
    val out = new Array[Double](64)
    var i = 0
    while (i < 64) {
      var acc = 0.0
      var k = 0
      while (k < 64) {
        acc = if (java.lang.Integer.bitCount(i & k) % 2 == 0) acc + v(k)
              else acc - v(k)
        k += 1
      }
      out(i) = acc / 8.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != 64) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[64];
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $v[$j] = $a.getDouble($j);
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[64];
         |    for (int $i = 0; $i < 64; $i++) {
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < 64; $k++) {
         |        $acc = (java.lang.Integer.bitCount($i & $k) % 2 == 0)
         |          ? $acc + $v[$k] : $acc - $v[$k];
         |      }
         |      $out[$i] = $acc / 8.0;
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Hadamard64 = copy(child = newChild)
}

/** `float_dot_fd(vec array<float|double>, cent array<double>) → double` —
  * the mixed-type dot product of a stored vector against a TRAINED
  * centroid (double array): the IVF coarse-assignment hot loop.
  * `graft.queries.Similarity.ivfCosC`'s higher-order fold is
  * CodegenFallback — an interpreted 64-step lambda per (corpus row ×
  * centroid) inside `array_min(transform(cents, …))`, k evaluations per
  * row in every cell assignment (members, corpus-assign, probe ranking)
  * — the same hot-loop class [[FloatVectorDot]] retired for the
  * float×float pairs (r16-opt; guide §4.1). Identical arithmetic in the
  * identical order: `acc += (double) vec[i] · cent[i]`, i ascending —
  * bit-equal to the fold and the DuckDB twin (VectorExpressionsSpec).
  * Length mismatch, null input or null element yields NULL.
  */
case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot_fd requires (array<float|double>, array<double>), got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot_fd"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (vecIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += xv * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get =
        if (vecIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $get * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDot =
    copy(left = newLeft, right = newRight)
}

/** `float_l2_sub(vec array<float|double>, cent array<double>, lo) →
  * double` — squared L2 between a subspace centroid and the `lo`-offset
  * slice of a stored vector: the PQ assignment/encode hot loop. The
  * higher-order formulation (`graft.queries.Similarity.l2SubExpr`'s
  * `aggregate(sequence(...))` fold) is CodegenFallback — an interpreted
  * 16-step lambda per (row × codeword) candidate, and every PQ
  * train/encode evaluates it m·k times per corpus row (r16-opt plan
  * audit; the [[FloatDoubleL2]]/[[Hadamard64]] treatment). Identical
  * arithmetic in the identical order: `d = (double) vec[lo+i] − cent[i]`,
  * `acc += d·d`, i ascending — bit-equal to the fold and the DuckDB twin
  * (VectorExpressionsSpec pins equality against the interpreted text).
  * The vector side may be float (corpus embeddings) or double (residual
  * and rotated frames — the fold's CAST is a no-op there). A null input,
  * null element, or an out-of-range slice yields NULL (the fold would
  * ANSI-throw on the latter; no caller slices out of range — centroids
  * are built `transform(sequence(0, sub−1), …)` against the same `lo`).
  */
case class FloatDoubleL2Sub(vec: Expression, cent: Expression,
    lo: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cent
  override def third: Expression = lo

  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cent.dataType, lo.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _),
          IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, c, l) => TypeCheckResult.TypeCheckFailure(
        s"float_l2_sub requires (array<float|double>, array<double>, integral), got $v, $c, $l")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "float_l2_sub"

  private def offOf(c: Any): Long = c match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val off = offOf(c)
    val n = y.numElements()
    if (off < 0 || off + n > x.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = (off + i).toInt
      if (x.isNullAt(xi) || y.isNullAt(i)) return null
      val xv = if (vecIsFloat) x.getFloat(xi).toDouble else x.getDouble(xi)
      val d = xv - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val get =
        if (vecIsFloat) s"(double) $a.getFloat($xi)" else s"$a.getDouble($xi)"
      s"""
         |int $n = $b.numElements();
         |long $off = (long) $c;
         |if ($off < 0 || $off + $n > $a.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $xi = (int) $off + $i;
         |    if ($a.isNullAt($xi) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $get - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): FloatDoubleL2Sub =
    copy(vec = newFirst, cent = newSecond, lo = newThird)
}

/** `corr_moments5(array<struct<x:double, y:double>>) →
  * struct<sx, sy, sxy, sxx, syy>` — the five rolling-regression moment
  * sums over a windowed frame list, each accumulated LEFT-TO-RIGHT in
  * frame order: the closed-form Pearson/OLS primitives of the
  * w7/w11 rolling windows. The retired formulation ran FIVE interpreted
  * `aggregate(fr, 0D, …)` lambda folds per output row (CodegenFallback —
  * and a struct-accumulator single fold measured SLOWER still, the
  * w7 scaladoc's 3.5 vs 2.8 s note); this is one codegen'd loop
  * carrying five primitive double accumulators. Each sum's addition
  * sequence is IDENTICAL to its standalone fold (independent
  * accumulators, same element order), so the w-family oracle hashes are
  * unchanged (VectorExpressionsSpec pins all five against the folds).
  * Null array → NULL; a null element or null x/y field → NULL struct
  * (the separate folds would null only the sums reading that field —
  * the callers' inputs are exact-integer-descale aggregates over inner
  * joins, never null; deviation documented here and in the spec).
  */
case class RollingMoments5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"corr_moments5 requires array<struct<double, double>>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("sx", DoubleType, nullable = false),
    StructField("sy", DoubleType, nullable = false),
    StructField("sxy", DoubleType, nullable = false),
    StructField("sxx", DoubleType, nullable = false),
    StructField("syy", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "corr_moments5"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val s = xs.getStruct(i, 2)
      if (s.isNullAt(0) || s.isNullAt(1)) return null
      val x = s.getDouble(0)
      val y = s.getDouble(1)
      sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sx, sy, sxy, sxx, syy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val sxy = ctx.freshName("sxy")
      val sxx = ctx.freshName("sxx")
      val syy = ctx.freshName("syy")
      s"""
         |int $n = $a.numElements();
         |double $sx = 0.0, $sy = 0.0, $sxy = 0.0, $sxx = 0.0, $syy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  InternalRow $s = $a.getStruct($i, 2);
         |  if ($s.isNullAt(0) || $s.isNullAt(1)) { ${ev.isNull} = true; break; }
         |  double $x = $s.getDouble(0);
         |  double $y = $s.getDouble(1);
         |  $sx += $x; $sy += $y; $sxy += $x * $y; $sxx += $x * $x; $syy += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{Double.valueOf($sx), Double.valueOf($sy),
         |        Double.valueOf($sxy), Double.valueOf($sxx),
         |        Double.valueOf($syy)});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingMoments5 = copy(child = newChild)
}

/** `vec_sum_slice(ms, lo, sub) → array<double>` — the LEVEL-1 inner loop
  * of the two-level training folds ([[graft.queries.Similarity]]'s
  * meanFold2): over an ALREADY vec_id-ORDERED
  * `array<struct<vec_id, vec: array<float|double>>>` bucket, the
  * per-dimension left-to-right sum of `vec[lo + d]` for
  * d ∈ [0, sub). Replaces the interpreted
  * `transform(sequence(0, sub-1), d -> aggregate(ms, 0D, (a, m) ->
  * a + CAST(m.vec[d + lo] AS DOUBLE)))` (CodegenFallback — sub × |bucket|
  * boxed lambda steps per bucket, corpus-sized total work in every
  * k-means/PQ/OPQ train round). Per output d the accumulation sequence
  * is IDENTICAL to the standalone fold (independent accumulators, same
  * element order), so centroids — and every oracle hash downstream —
  * are unchanged (VectorExpressionsSpec pins bit-equality on float and
  * double vectors). Null array/lo → NULL; a null element, null vec or
  * null cell → NULL (the fold's acc + NULL). An out-of-range slice
  * returns NULL where the ANSI fold would throw — the float_l2_sub
  * deviation, callers always slice within dims. CONSEQUENCE (ADVICE
  * r16-1): in a training fold one malformed (short) feature row NULLs
  * that bucket's partial and therefore the whole gradient/weight vector
  * — a silent model kill downstream. The quality-model loop therefore
  * COLLECTS its weights per round (graft.queries.Text.mqTrainWeightsVec),
  * where a NULL element fails loudly at the driver; any new fold
  * consumer should either collect the same way or pre-validate lengths.
  */
case class OrderedVecSumSlice(ms: Expression, lo: Expression,
    sub: Expression) extends TernaryExpression {

  override def first: Expression = ms
  override def second: Expression = lo
  override def third: Expression = sub

  private lazy val vecIsFloat: Boolean = ms.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (ms.dataType, lo.dataType, sub.dataType) match {
      case (ArrayType(StructType(fields), _), IntegerType | LongType,
          IntegerType | LongType)
          if fields.length == 2 &&
            (fields(1).dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) => TypeCheckResult.TypeCheckSuccess
      case (m, l, s) => TypeCheckResult.TypeCheckFailure(
        s"vec_sum_slice requires (array<struct<_, array<float|double>>>, integral, integral), got $m, $l, $s")
    }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_slice"

  private def longOf(c: Any): Long = c match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val off = longOf(b)
    val sub = longOf(c).toInt
    if (off < 0 || sub < 0) return null
    val n = xs.numElements()
    val acc = new Array[Double](sub)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val s = xs.getStruct(i, 2)
      if (s.isNullAt(1)) return null
      val v = s.getArray(1)
      if (off + sub > v.numElements()) return null
      var d = 0
      while (d < sub) {
        val vi = (off + d).toInt
        if (v.isNullAt(vi)) return null
        acc(d) += (if (vecIsFloat) v.getFloat(vi).toDouble
          else v.getDouble(vi))
        d += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val vi = ctx.freshName("vi")
      val off = ctx.freshName("off")
      val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc")
      val st = ctx.freshName("st")
      val v = ctx.freshName("v")
      val get =
        if (vecIsFloat) s"(double) $v.getFloat($vi)" else s"$v.getDouble($vi)"
      s"""
         |long $off = (long) $b;
         |int $sub = (int) $c;
         |if ($off < 0 || $sub < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double[] $acc = new double[$sub];
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    InternalRow $st = $a.getStruct($i, 2);
         |    if ($st.isNullAt(1)) { ${ev.isNull} = true; break; }
         |    ArrayData $v = $st.getArray(1);
         |    if ($off + $sub > $v.numElements()) { ${ev.isNull} = true; break; }
         |    for (int $d = 0; $d < $sub; $d++) {
         |      int $vi = (int) $off + $d;
         |      if ($v.isNullAt($vi)) { ${ev.isNull} = true; break; }
         |      $acc[$d] += $get;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($acc);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): OrderedVecSumSlice =
    copy(ms = newFirst, lo = newSecond, sub = newThird)
}

/** `ordered_sum_field(ds) → double` — the scalar sibling of
  * [[OrderedVecSumSlice]]: the left-to-right sum of struct field 1
  * (double) over an already-ordered `array<struct<_, double>>` — the
  * level-1 bucket partial and level-2 bucket-partials fold of sumFold2.
  * Replaces the interpreted `aggregate(ds, 0D, (a, t) -> a + t.v)`
  * with the identical accumulation sequence (spec-pinned); a null
  * element or null field → NULL, the fold's acc + NULL.
  */
case class OrderedSumField(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ordered_sum_field requires array<struct<_, double>>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "ordered_sum_field"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val s = xs.getStruct(i, 2)
      if (s.isNullAt(1)) return null
      acc += s.getDouble(1)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  InternalRow $s = $a.getStruct($i, 2);
         |  if ($s.isNullAt(1)) { ${ev.isNull} = true; break; }
         |  $acc += $s.getDouble(1);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): OrderedSumField = copy(child = newChild)
}

object VectorFunctions {

  private[functions] val vecSumSliceFid = FunctionIdentifier("vec_sum_slice")
  private[functions] val vecSumSliceInfo =
    new ExpressionInfo(classOf[OrderedVecSumSlice].getName, "vec_sum_slice")
  private[functions] val vecSumSliceBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 3, "vec_sum_slice takes exactly 3 arguments")
    OrderedVecSumSlice(exprs.head, exprs(1), exprs(2)): Expression
  }

  private[functions] val doubleDotFid = FunctionIdentifier("double_dot")
  private[functions] val doubleDotInfo =
    new ExpressionInfo(classOf[DoubleVectorDot].getName, "double_dot")
  private[functions] val doubleDotBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "double_dot takes exactly 2 arguments")
    DoubleVectorDot(exprs.head, exprs(1)): Expression
  }

  private[functions] val orderedSumFid = FunctionIdentifier("ordered_sum_field")
  private[functions] val orderedSumInfo =
    new ExpressionInfo(classOf[OrderedSumField].getName, "ordered_sum_field")
  private[functions] val orderedSumBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "ordered_sum_field takes exactly 1 argument")
    OrderedSumField(exprs.head): Expression
  }


  private[functions] val hadamardFid = FunctionIdentifier("hadamard64")
  private[functions] val hadamardInfo =
    new ExpressionInfo(classOf[Hadamard64].getName, "hadamard64")
  private[functions] val hadamardBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "hadamard64 takes exactly 1 argument")
    Hadamard64(exprs.head): Expression
  }

  private[functions] val floatL2Fid = FunctionIdentifier("float_l2")
  private[functions] val floatL2Info =
    new ExpressionInfo(classOf[FloatDoubleL2].getName, "float_l2")
  private[functions] val floatL2Builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "float_l2 takes exactly 2 arguments")
    FloatDoubleL2(exprs.head, exprs(1)): Expression
  }

  private[functions] val moments5Fid = FunctionIdentifier("corr_moments5")
  private[functions] val moments5Info =
    new ExpressionInfo(classOf[RollingMoments5].getName, "corr_moments5")
  private[functions] val moments5Builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "corr_moments5 takes exactly 1 argument")
    RollingMoments5(exprs.head): Expression
  }

  private[functions] val floatDotFdFid = FunctionIdentifier("float_dot_fd")
  private[functions] val floatDotFdInfo =
    new ExpressionInfo(classOf[FloatDoubleDot].getName, "float_dot_fd")
  private[functions] val floatDotFdBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "float_dot_fd takes exactly 2 arguments")
    FloatDoubleDot(exprs.head, exprs(1)): Expression
  }

  private[functions] val floatL2SubFid = FunctionIdentifier("float_l2_sub")
  private[functions] val floatL2SubInfo =
    new ExpressionInfo(classOf[FloatDoubleL2Sub].getName, "float_l2_sub")
  private[functions] val floatL2SubBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 3, "float_l2_sub takes exactly 3 arguments")
    FloatDoubleL2Sub(exprs.head, exprs(1), exprs(2)): Expression
  }

  private[functions] val fid = FunctionIdentifier("float_dot")
  private[functions] val info =
    new ExpressionInfo(classOf[FloatVectorDot].getName, "float_dot")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "float_dot takes exactly 2 arguments")
    FloatVectorDot(exprs.head, exprs(1)): Expression
  }

  private[functions] val longDotFid = FunctionIdentifier("long_dot")
  private[functions] val longDotInfo =
    new ExpressionInfo(classOf[LongVectorDot].getName, "long_dot")
  private[functions] val longDotBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "long_dot takes exactly 2 arguments")
    LongVectorDot(exprs.head, exprs(1)): Expression
  }

  private[functions] val simhashFid = FunctionIdentifier("simhash64")
  private[functions] val simhashInfo =
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64")
  private[functions] val simhashBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "simhash64 takes exactly 1 argument")
    SimHash64(exprs.head): Expression
  }

  /** Idempotently register the custom functions in this session's registry
    * so `expr("float_dot(a, b)")` / `expr("simhash64(a)")` resolve.
    * Called lazily at query-build time — works for any session,
    * extensions-configured or not.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry.functionExists(fid)) {
      spark.sessionState.functionRegistry.registerFunction(fid, info, builder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(simhashFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        simhashFid, simhashInfo, simhashBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(longDotFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        longDotFid, longDotInfo, longDotBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(floatL2Fid)) {
      spark.sessionState.functionRegistry.registerFunction(
        floatL2Fid, floatL2Info, floatL2Builder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(hadamardFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        hadamardFid, hadamardInfo, hadamardBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(floatL2SubFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        floatL2SubFid, floatL2SubInfo, floatL2SubBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(floatDotFdFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        floatDotFdFid, floatDotFdInfo, floatDotFdBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(moments5Fid)) {
      spark.sessionState.functionRegistry.registerFunction(
        moments5Fid, moments5Info, moments5Builder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(vecSumSliceFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        vecSumSliceFid, vecSumSliceInfo, vecSumSliceBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(orderedSumFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        orderedSumFid, orderedSumInfo, orderedSumBuilder)
    }
    if (!spark.sessionState.functionRegistry.functionExists(doubleDotFid)) {
      spark.sessionState.functionRegistry.registerFunction(
        doubleDotFid, doubleDotInfo, doubleDotBuilder)
    }
  }
}

/** `SparkSessionExtensions` hook: sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) get `float_dot` from the start
  * — the deployment path for a shared cluster where per-session lazy
  * registration is not wanted.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      VectorFunctions.fid, VectorFunctions.info, VectorFunctions.builder))
    ext.injectFunction((
      VectorFunctions.simhashFid, VectorFunctions.simhashInfo,
      VectorFunctions.simhashBuilder))
    ext.injectFunction((
      TextFunctions.minhashFid, TextFunctions.minhashInfo,
      TextFunctions.minhashBuilder))
    ext.injectFunction((
      TextFunctions.minhashXxFid, TextFunctions.minhashXxInfo,
      TextFunctions.minhashXxBuilder))
    ext.injectFunction((
      VectorFunctions.longDotFid, VectorFunctions.longDotInfo,
      VectorFunctions.longDotBuilder))
    ext.injectFunction((
      VectorFunctions.floatL2Fid, VectorFunctions.floatL2Info,
      VectorFunctions.floatL2Builder))
    ext.injectFunction((
      VectorFunctions.hadamardFid, VectorFunctions.hadamardInfo,
      VectorFunctions.hadamardBuilder))
    ext.injectFunction((
      VectorFunctions.floatL2SubFid, VectorFunctions.floatL2SubInfo,
      VectorFunctions.floatL2SubBuilder))
    ext.injectFunction((
      VectorFunctions.floatDotFdFid, VectorFunctions.floatDotFdInfo,
      VectorFunctions.floatDotFdBuilder))
    ext.injectFunction((
      VectorFunctions.moments5Fid, VectorFunctions.moments5Info,
      VectorFunctions.moments5Builder))
    ext.injectFunction((
      TextFunctions.lshFid, TextFunctions.lshInfo, TextFunctions.lshBuilder))
    ext.injectFunction((
      TextFunctions.ngramFid, TextFunctions.ngramInfo,
      TextFunctions.ngramBuilder))
    ext.injectFunction((
      TextFunctions.bucketCountsFid, TextFunctions.bucketCountsInfo,
      TextFunctions.bucketCountsBuilder))
  }
}
