package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling-curve index kernel.
  *
  * Skilling's transpose algorithm (J. Skilling, "Programming the Hilbert
  * Curve", AIP Conf. Proc. 707, 2004 — public algorithm), n dimensions ×
  * `bits` bits per coordinate, primitive long loops, no allocation beyond
  * one n-long scratch array.
  *
  * Why a second curve next to [[graft.ops.RangeLayout.zorderValue]]: the
  * Hilbert curve is CONTINUOUS — every consecutive pair of curve positions
  * is unit-adjacent in space (the property HilbertSpec verifies
  * exhaustively), where Morton order takes long diagonal jumps at power-of-
  * two boundaries. A box predicate therefore intersects fewer, longer curve
  * runs → fewer files for the same box (Iceberg added hilbert sort for
  * exactly this reason). Cost: the index is a short loop per row instead of
  * Morton's pure shift-or arithmetic — negligible against a write's I/O.
  */
private[functions] object HilbertKernel {

  /** coords (each a non-negative `bits`-wide value) → Hilbert index in
    * [0, 2^(n·bits)). Mutates a clone, not the caller's array.
    */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = coords.clone()
    // inverse-undo pass: walk bit planes high→low, exchanging/inverting
    // sub-cube axes so each plane becomes an independent Gray digit
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of axis 0
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray-encode across axes
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → index: bit b of axis j lands at position b·n + (n−1−j)…
    // i.e. MSB-first interleave across axes
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { h = (h << 1) | ((x(j) >>> b) & 1L); j += 1 }
      b -= 1
    }
    h
  }
}

/** `hilbert_index(c0, c1, …, bits)`: Hilbert curve position of the given
  * pre-scaled long coordinates. Registered via
  * [[graft.core.GraftExtensions]]; used by
  * [[graft.ops.RangeLayout.writeHilbertClustered]].
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {
  require(bits >= 1 && bits * children.size <= 62,
    s"hilbert_index: bits*dims must fit a long, got $bits * ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size >= 2 && children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires >= 2 bigint coordinates, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val coords = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertKernel.index(coords, bits)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  override def prettyName: String = "hilbert_index"
}
