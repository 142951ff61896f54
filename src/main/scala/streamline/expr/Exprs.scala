package streamline.expr

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions with whole-stage codegen — the witness of
  * the reference lineage's codegen'd scalar-function surface (Flink 1.x
  * generated Janino functions; SURVEY.md §2.10, §4). Both expressions
  * implement `doGenCode`, so they fuse into whole-stage codegen instead
  * of falling back to interpreted eval — the hot path stays compiled at
  * 100 TB.
  */

/** revenue(price, discount) = price * (1 - discount), pure IEEE double
  * per-row math (bit-identical in any engine). */
case class Revenue(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are DoubleType by construction (call sites cast explicitly);
  // ExpectsInputTypes is private[sql] and so not extendable from here.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_revenue"

  override protected def nullSafeEval(price: Any, discount: Any): Any =
    price.asInstanceOf[Double] * (1.0 - discount.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, d) => s"$p * (1.0 - $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Revenue =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) over two float vectors, accumulated in double with a
  * single sequential loop (same element order as the oracle's fold).
  * Zero-norm inputs yield 0.0. Codegen'd: the kNN scan stays inside
  * whole-stage codegen — no UDF serialization per row. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are ArrayType(FloatType) by construction (see dataset schema).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Euclidean (L2) distance over two float vectors, double-accumulated
  * in one sequential loop — the LSH verify's hot path. Codegen'd for
  * the same reason as [[CosineSim]]: the candidate-pair verify scan
  * stays inside whole-stage codegen instead of an interpreted
  * aggregate(zip_with(...)) higher-order-function tree per row. */
case class EuclidDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are ArrayType(FloatType) by construction (see dataset schema).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_euclid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
          $s += $d * $d;
        }
        ${ev.value} = Math.sqrt($s);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclidDist =
    copy(left = newLeft, right = newRight)
}

/** xxhash64 of every word 3-shingle of a single-space-separated text,
  * in document order — the codegen'd replacement for the interpreted
  * `transform(shingles3(text), s => xxhash64(s))` higher-order tree
  * (HOFs are CodegenFallback, evaluated per element per row; measured
  * as a visible slice of every shingle-pipeline query). Byte-exact
  * with that spelling: `split(text, " ")` (limit −1, empties kept)
  * makes word k the bytes between single 0x20 separators, so shingle k
  * = w[k]+" "+w[k+1]+" "+w[k+2] is EXACTLY the original text's bytes
  * from the start of word k to the end of word k+2 — hashed zero-copy
  * with Spark's own XXH64 at the xxhash64 default seed 42.
  * ShingleExprSpec pins bitwise agreement with the HOF spelling. */
case class HashedShingles3(child: Expression) extends UnaryExpression {

  // Input is StringType by construction (document text columns).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    Exprs.hashedShingles3Eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"streamline.expr.Exprs.hashedShingles3Eval($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HashedShingles3 = copy(child = newChild)
}

object Exprs {
  /** Eval body of [[HashedShingles3]], shared by the interpreted and
    * generated paths (the codegen emits one static call per row). */
  def hashedShingles3Eval(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var spaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val words = spaces + 1
    val m = math.max(words - 2, 0)
    val out = new Array[Long](m)
    if (m > 0) {
      // starts(k) = first byte of word k
      val starts = new Array[Int](words)
      starts(0) = 0
      var w = 1
      i = 0
      while (i < n) {
        if (s.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
        i += 1
      }
      var k = 0
      while (k < m) {
        val from = starts(k)
        // end of word k+2: the byte before word k+3's start, or EOS
        val to = if (k + 3 < words) starts(k + 3) - 1 else n
        out(k) = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
        k += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column-API entry points for the custom expressions. */
  def revenue(price: Column, discount: Column): Column =
    GraftShim.column(Revenue(GraftShim.expression(price.cast("double")),
      GraftShim.expression(discount.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a),
      GraftShim.expression(b)))

  def euclid(a: Column, b: Column): Column =
    GraftShim.column(EuclidDist(GraftShim.expression(a),
      GraftShim.expression(b)))

  def hashedShingles3(text: Column): Column =
    GraftShim.column(HashedShingles3(GraftShim.expression(text)))
}
