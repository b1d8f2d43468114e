package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The deterministic software-transcendental kernels behind
  * ColFns.detLn/detMln/detExpMicro — ONE implementation used by both the
  * interpreted eval and the codegen path (a static-forwarder call), so the
  * op sequence lives in exactly one place. Every operation is an IEEE-754
  * +,-,*,/ or an integer shift/compare, all of which are exact/correctly
  * rounded in every JIT tier and in DuckDB — the property libm's ln/exp
  * lack (the q239 rounds-7/8 fresh-run flips were a C2-intrinsic-vs-
  * interpreted Math.log 1-ulp divergence). The DuckDB oracle mirrors in
  * ColFns.detLnSql/detExpMicroSql state the SAME sequence in SQL;
  * tools/DetSweep + tools/check_detmath.py re-verify bit-identity over a
  * 100k-point domain.
  *
  * As native expressions the kernels are single plan nodes — the Column
  * composition of the same program built ~1.5k-node trees whose
  * duplication through downstream operators cost whole seconds of
  * analysis/codegen on token-scale queries (the round-9 q231/q169/q270
  * bench regressions).
  */
object DetMath {

  private val Ln2 = 0.6931471805599453d

  /** Domain bound for [[lnRat]] operands: below 2^51 the shifted
    * intermediates (p1, q2, p1±q2) stay exact in IEEE-754 doubles AND
    * `q1 << adj` cannot wrap (at bitlen 63, equalized-then-doubled q
    * would overflow Long and return garbage instead of failing). All
    * call sites pass counts/micros far below this; fail loudly if a
    * future caller doesn't.
    */
  val LnRatMax = 1L << 51

  /** ln(p/q) for BIGINT p, q in [1, 2^51) — integer bit-length range
    * reduction to [1/2, 1), atanh Horner in w = z^2 (|z| <= 1/3,
    * truncation < 1e-9), exact k·ln2 recombination. Mirrors
    * ColFns.detLnSql op for op. Throws on out-of-domain operands (the
    * SQL mirror has the same silent-garbage risk past the bound, so a
    * loud Spark-side failure is the cross-engine guard).
    */
  def lnRat(p: Long, q: Long): Double = {
    if (p < 1L || q < 1L || p >= LnRatMax || q >= LnRatMax)
      throw new IllegalArgumentException(
        s"graft_detln domain is [1, 2^51): got p=$p q=$q")
    val e = java.lang.Long.numberOfLeadingZeros(p) -
      java.lang.Long.numberOfLeadingZeros(q) // bitlen(q) - bitlen(p)
    val sp = if (e > 0) e else 0
    val sq = if (e < 0) -e else 0
    val p1 = p << sp
    val q1 = q << sq
    val adj = if (p1 >= q1) 1 else 0
    val q2 = q1 << adj
    val k = (adj + sq - sp).toDouble
    val z = (p1 - q2).toDouble / (p1 + q2).toDouble
    val w = z * z
    var acc = 1.0d / 17.0d
    var d = 15
    while (d >= 3) {
      acc = 1.0d / d + w * acc
      d -= 2
    }
    val s = 1.0d + w * acc
    val lnm = 2.0d * z * s
    lnm + k * Ln2
  }

  /** exp(m/1e6) for BIGINT micro m — clamp/saturate at ±40e6, n·ln2 range
    * reduction, 13-term Taylor Horner, exact power-of-two scaling. Mirrors
    * ColFns.detExpMicroSql op for op.
    */
  def expMicro(m0: Long): Double = {
    val m = if (m0 < 40000000L) m0 else 40000000L
    if (m < -40000000L) return 0.0d
    val x = m.toDouble / 1000000.0d
    val n = Math.floor(x / Ln2 + 0.5d).toLong
    val r = x - n.toDouble * Ln2
    // factorials 13! down to 1!
    var acc = 1.0d / 6227020800.0d // 1/13!
    var f = 479001600L // 12!
    var k = 12
    while (k >= 1) {
      acc = 1.0d / f.toDouble + r * acc
      f = f / k
      k -= 1
    }
    val s = 1.0d + r * acc
    if (n >= 0) s * (1L << n).toDouble else s / (1L << -n).toDouble
  }
}

/** graft_detln(p, q): the deterministic ln(p/q) as a single codegen'd plan
  * node (see [[DetMath.lnRat]]).
  */
case class DetLnRat(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_detln"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DetMath.lnRat(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DetMath.lnRat($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_detexp(m): the deterministic exp(m/1e6) as a single codegen'd plan
  * node (see [[DetMath.expMicro]]).
  */
case class DetExpMicro(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_detexp"

  override protected def nullSafeEval(input: Any): Any =
    DetMath.expMicro(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DetMath.expMicro($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
