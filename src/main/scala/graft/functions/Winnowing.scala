package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing fingerprints (Schleimer et al.,
  * "Winnowing: Local Algorithms for Document Fingerprinting") — the
  * fingerprint selection the reference's corpus tooling uses for near-copy
  * detection, here as a single codegen-friendly scalar over the document.
  *
  * Semantics are IDENTICAL to the SQL formulation it replaces (and to the
  * DuckDB oracle): hash every character k-gram of the (pre-lowercased)
  * text as the first 8 hex chars of its md5, then keep the minimum hash of
  * every w-hash window; return the distinct selected hashes sorted
  * ascending. Positions count Unicode code points, exactly like SQL
  * `substr` — the byte walk below finds code-point starts in the UTF-8
  * image rather than decoding to UTF-16.
  *
  * Why an expression and not SQL: the array formulation
  * (`transform(sequence(...), p -> substring(md5(substr(t,p,k)),1,8))` +
  * `array_min(slice(...))` per window) runs the lambda INTERPRETED per
  * element — per-position expression-tree dispatch plus per-window O(w)
  * slice scans, O(n·w) interpreted steps in all. This one method call per
  * ROW does one md5 per position into a reused digest buffer, a monotonic
  * deque for O(n) total sliding-window minima, and integer compares
  * (unsigned 32-bit order == lexicographic order on fixed-width lowercase
  * hex, so hex strings materialize only once per distinct fingerprint).
  * `doGenCode` emits a static call, keeping the whole-stage-codegen
  * pipeline intact. ~5x on the sf0.1 bench entry. */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnowing requires k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowingFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowingFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object WinnowingFingerprints {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets in the UTF-8 image (SQL substr positions)
    var cpCount = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cpCount += 1
      i += 1
    }
    val starts = new Array[Int](cpCount + 1)
    var p = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(p) = i; p += 1 }
      i += 1
    }
    starts(cpCount) = bytes.length

    val nGrams = cpCount - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])

    // first 4 md5 bytes of each k-gram as an unsigned 32-bit value: numeric
    // order equals lexicographic order on the 8-char lowercase hex form
    val md = digest.get()
    val hashes = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, starts(g), starts(g + k) - starts(g))
      val d = md.digest()
      hashes(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }

    // monotonic-deque sliding minimum over every w-hash window
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque indices in [head, tail)
    g = 0
    while (g < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(g)) tail -= 1
      deque(tail) = g
      tail += 1
      if (deque(head) <= g - w) head += 1
      if (g >= w - 1) selected.add(hashes(deque(head)))
      g += 1
    }

    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) {
      val v = it.next().longValue()
      val cs = new Array[Char](8)
      var s = 0
      while (s < 8) {
        cs(s) = HexChars(((v >>> ((7 - s) * 4)) & 0xf).toInt)
        s += 1
      }
      out(o) = UTF8String.fromString(new String(cs))
      o += 1
    }
    new GenericArrayData(out)
  }

  val FunctionName = "winnowing_fingerprints"

  /** Register `winnowing_fingerprints(text, k, w)` as a session temp SQL
    * function (idempotent) — the public route from a custom Expression to
    * both the Column API (`expr(...)`) and plain SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      {
        case Seq(t, Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          WinnowingFingerprints(t, k, w)
        case args => throw new IllegalArgumentException(
          s"$FunctionName(text, k, w) expects literal integer k and w, got $args")
      },
      "internal")
}
