package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** dot_product(a, b): native codegen'd dot product over array<float> /
  * array<double> columns — the hot inner loop of cosine similarity /
  * near-dup search. Accumulates in double with sequential adds (same
  * fold order as `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`, so it
  * is bit-compatible with the SQL formulation and the DuckDB oracle), but
  * without materializing the zipped intermediate array per row — the
  * difference between O(pairs·dim) float ops and O(pairs) array
  * allocations in the 100 TB hot path.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double> inputs, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      // A null element nulls the whole product, matching the
      // aggregate(zip_with(...)) SQL formulation (x*y -> null, acc+null
      // -> null) — not silently-treated-as-zero.
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_signature(v): sign-bit signature of a vector under a fixed
  * hyperplane matrix — the LSH bucket id, as a codegen'd expression. The
  * plane matrix rides along as a referenced constant object
  * (ctx.addReferenceObj), NOT as literal array expressions: the generated
  * code is one tight double loop regardless of matrix size, so the
  * corpus scan stays inside WholeStageCodegen (the per-row UDF this
  * replaces forced a BatchEvalPython-style codegen break... in Scala's
  * case an opaque invoke + Seq boxing per row).
  *
  * Null vector → null signature; null elements contribute 0 (embeddings
  * are dense; a missing dimension shouldn't void the bucket).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val f = isFloat
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var d = 0.0
      var i = 0
      val n = math.min(v.numElements(), plane.length)
      while (i < n) {
        if (!v.isNullAt(i)) {
          d += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) * plane(i)
        }
        i += 1
      }
      bucket = bucket * 2 + (if (d > 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      val plane = ctx.freshName("plane")
      s"""
         |long $bucket = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $plane = $mat[$p];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) { $d += ((double) $a.$get($i)) * $plane[$i]; }
         |  }
         |  $bucket = $bucket * 2L + ($d > 0 ? 1L : 0L);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** horner_hash(s, mod): Horner fold h ← (h·31 + codePoint) mod `mod`
  * over the string's Unicode CODE POINTS — an ENGINE-PORTABLE string
  * hash. Unlike xxhash64/murmur it is reproducible in any SQL engine
  * with integer arithmetic (the DuckDB oracles re-express it as a
  * list_reduce over ord(substr(..)), which yields code points at
  * character positions), which is what lets the MinHash/SimHash sketch
  * queries be hash-gated instead of rows-only. Folding code points —
  * not UTF-8 bytes — keeps that bitwise parity on ANY text, ASCII or
  * not; a multilingual pretraining corpus flows through the sketch
  * family unchanged. The interpreted and codegen paths share one
  * decoder (`HornerHash.foldUtf8`, a static call the JIT inlines).
  * `mod` must be < 2^58 so h·31 + 0x10FFFF cannot overflow a long
  * (31·2^58 + 2^21 < 2^63).
  */
case class HornerHash(child: Expression, mod: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(mod > 0 && mod < (1L << 58), s"horner_hash: mod $mod out of range")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"horner_hash expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    HornerHash.foldUtf8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.HornerHash.foldUtf8($a.getBytes(), ${mod}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HornerHash {
  /** Decode ONE code point at byte offset `i` of a UTF-8 byte array,
    * returning `(codePoint << 2) | (byteLength - 1)` packed in an Int.
    * Malformed input replays the JVM String decoder's replacement
    * semantics EXACTLY (empirically pinned — it is close to, but not,
    * the Unicode maximal-subpart recommendation): a bad lead or a lead
    * whose FIRST continuation is positionally invalid (non-continuation,
    * E0 overlong, F0 overlong, F4 out-of-range, any F5..FF) burns one
    * U+FFFD for the lead byte alone; a later bad continuation burns one
    * U+FFFD for the bytes before it; a truncated-at-end sequence whose
    * bytes so far pass those positional checks collapses to one U+FFFD;
    * and a fully-assembled ED-lead surrogate (ED A0..BF XX) consumes
    * all three bytes for one U+FFFD. This keeps the decoder
    * bitwise-interchangeable with `new String(bytes, UTF_8)`-based
    * twins on ANY bytes, valid or not — spec-pinned against the JVM
    * decoder on targeted shapes + random byte arrays in PropertySpec.
    */
  def decodePacked(bytes: Array[Byte], i: Int, n: Int): Int = {
    val b0 = bytes(i) & 0xff
    if (b0 < 0x80) b0 << 2
    else if (b0 < 0xc2) 0xfffd << 2 // bare continuation or overlong C0/C1
    else if (b0 < 0xe0) {
      if (i + 1 < n && (bytes(i + 1) & 0xc0) == 0x80)
        ((((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)) << 2) | 1
      else 0xfffd << 2
    } else if (b0 < 0xf0) {
      val b1 = if (i + 1 < n) bytes(i + 1) & 0xff else -1
      // positional first-continuation checks (reject the lead alone):
      // not a continuation, or E0's overlong range. ED's surrogate range
      // is NOT positional — the JVM only rejects it post-assembly.
      if (b1 == -1 || (b1 & 0xc0) != 0x80 || (b0 == 0xe0 && b1 < 0xa0))
        0xfffd << 2
      else if (i + 2 >= n || (bytes(i + 2) & 0xc0) != 0x80) (0xfffd << 2) | 1
      else {
        val cp = ((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        if (cp >= 0xd800 && cp <= 0xdfff) (0xfffd << 2) | 2 // one FFFD, 3 bytes
        else (cp << 2) | 2
      }
    } else if (b0 < 0xf5) {
      // F0 rejects overlong (90..BF); F4 rejects > U+10FFFF (80..8F)
      val lo = if (b0 == 0xf0) 0x90 else 0x80
      val hi = if (b0 == 0xf4) 0x8f else 0xbf
      val b1 = if (i + 1 < n) bytes(i + 1) & 0xff else -1
      if (b1 < lo || b1 > hi) 0xfffd << 2
      else if (i + 2 >= n || (bytes(i + 2) & 0xc0) != 0x80) (0xfffd << 2) | 1
      else if (i + 3 >= n || (bytes(i + 3) & 0xc0) != 0x80) (0xfffd << 2) | 2
      else ((((b0 & 0x07) << 18) | ((b1 & 0x3f) << 12) |
        ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)) << 2) | 3
    } else 0xfffd << 2 // F5..FF: never valid UTF-8
  }

  /** Horner fold h ← (h·31 + codePoint) mod `mod` over the code points
    * of a UTF-8 byte array, decoded in place (no String allocation in
    * the per-row hot path). Shared by the Catalyst expression's
    * interpreted AND generated code (static forwarder — callable from
    * generated Java, inlined by the JIT), so the two paths cannot
    * drift. Malformed sequences fold the same U+FFFDs the JVM String
    * decoder produces (see `decodePacked`), so the expression and the
    * String-based twins agree even on invalid bytes a parquet
    * BINARY-as-string column might carry.
    */
  def foldUtf8(bytes: Array[Byte], mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { h = (h * 31 + b0) % mod; i += 1 }
      else {
        val packed = decodePacked(bytes, i, n)
        h = (h * 31 + (packed >>> 2)) % mod
        i += (packed & 3) + 1
      }
    }
    h
  }

  /** Code-point Horner fold over a JVM String — the plain-Scala twin of
    * `foldUtf8` for the streaming / mapPartitions paths that already
    * hold a String. Surrogate pairs fold as one code point, exactly
    * like the byte decoder and DuckDB's ord(substr(..)).
    */
  def foldString(s: String, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** simple_lower(s): per-code-point SIMPLE Unicode lowercase — the
  * ENGINE-PORTABLE lowercase. JVM/Spark `lower()` applies the FULL case
  * mapping (SpecialCasing.txt: U+0130 İ → 'i' + U+0307, two code points;
  * context-sensitive Greek final sigma), while DuckDB's utf8proc applies
  * the simple 1:1 mapping from UnicodeData.txt (İ → 'i', Σ → σ always) —
  * so any oracle-gated query that lowercases Turkish or Greek text through
  * the built-in `lower()` silently diverges from its DuckDB twin in both
  * hash values and token positions. This expression IS the simple mapping
  * (`Character.toLowerCase(int)` per code point — verified to agree with
  * DuckDB `lower()` on the divergent code points), so every gated
  * lowercase goes through it and "bitwise with DuckDB on any text" holds.
  * Residual divergence class (documented, not gated): Unicode VERSION skew
  * — code points cased in a newer Unicode than the JDK's tables (JDK 17 =
  * Unicode 13) lower as identity here but may map in a newer utf8proc.
  */
case class SimpleLower(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simple_lower expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    SimpleLower.lower(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.SimpleLower.lower($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimpleLower {
  /** Simple per-code-point lowercase of a UTF8String. ASCII fast path
    * maps bytes in place (zero decode); otherwise decodes via
    * `HornerHash.decodePacked` (JVM replacement semantics on malformed
    * bytes) and maps each code point through `Character.toLowerCase`.
    * Simple mappings are 1:1 in code points but NOT in bytes (e.g.
    * U+023A Ⱥ, 2 bytes → U+2C65 ⱥ, 3 bytes), hence the StringBuilder.
    */
  def lower(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var asciiNoUpper = true
    while (asciiNoUpper && i < n) {
      val x = b(i) & 0xff
      if (x >= 0x80 || (x >= 'A' && x <= 'Z')) asciiNoUpper = false else i += 1
    }
    if (asciiNoUpper) return s
    // second scan: all-ASCII? (i points at the first non-lower byte)
    var ascii = true
    var j = i
    while (ascii && j < n) { if ((b(j) & 0xff) >= 0x80) ascii = false else j += 1 }
    if (ascii) {
      val out = new Array[Byte](n)
      System.arraycopy(b, 0, out, 0, n)
      var k = i
      while (k < n) {
        val x = out(k)
        if (x >= 'A' && x <= 'Z') out(k) = (x + 32).toByte
        k += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
    } else {
      val sb = new java.lang.StringBuilder(n)
      var p = 0
      while (p < n) {
        val packed = HornerHash.decodePacked(b, p, n)
        sb.appendCodePoint(Character.toLowerCase(packed >>> 2))
        p += (packed & 3) + 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
    }
  }

  /** The plain-String twin for mapPartitions / streaming paths. */
  def lowerString(s: String): String = {
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80 || (c >= 'A' && c <= 'Z')) clean = false else i += 1
    }
    if (clean) return s
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    while (p < s.length) {
      val cp = s.codePointAt(p)
      sb.appendCodePoint(Character.toLowerCase(cp))
      p += Character.charCount(cp)
    }
    sb.toString
  }
}

/** nearest_centroid(v): argmin over squared-L2 distance to a fixed
  * centroid matrix — the IVF cell-assignment pass, as a codegen'd
  * expression. Like HyperplaneSignature, the centroids ride along as a
  * referenced constant (ctx.addReferenceObj), so the corpus scan stays
  * one fused double loop inside WholeStageCodegen instead of a per-row
  * UDF invoke with Seq boxing. Ties break toward the lower cell index
  * (strict `<` on the running minimum), matching the UDF it replaces
  * bit-for-bit. Null elements contribute 0 (dense embeddings); a null
  * vector yields a null cell.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val f = isFloat
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.numElements(), cc.length)
      while (i < n) {
        if (!v.isNullAt(i)) {
          val t = (if (f) v.getFloat(i).toDouble else v.getDouble(i)) - cc(i)
          d += t * t
        }
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cc = ctx.freshName("cc")
      s"""
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cc = $mat[$c];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $cc.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      double $t = ((double) $a.$get($i)) - $cc[$i];
         |      $d += $t * $t;
         |    }
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nearest_cells(v, k): the k nearest centroid indices by squared-L2,
  * ascending distance with ties toward the lower index — the IVF
  * query-side probe list, codegen'd. Selection is O(K·k) over the
  * K-length distance array (K ≤ a few hundred for any sane coarse
  * quantizer), allocation-free until the final int[k] result. Matches
  * the `sortBy(_._2).take(nProbe)` UDF it replaces bit-for-bit (Scala's
  * sortBy is stable, so ties also break by index there).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k > 0 && k <= centroids.length,
    s"nearest_cells: k=$k out of range for ${centroids.length} centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val f = isFloat
    val dist = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.numElements(), cc.length)
      while (i < n) {
        if (!v.isNullAt(i)) {
          val t = (if (f) v.getFloat(i).toDouble else v.getDouble(i)) - cc(i)
          d += t * t
        }
        i += 1
      }
      dist(c) = d
      c += 1
    }
    val out = new Array[Int](k)
    val used = new Array[Boolean](centroids.length)
    var j = 0
    while (j < k) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < centroids.length) {
        if (!used(c) && dist(c) < bestD) { bestD = dist(c); best = c }
        c += 1
      }
      // All remaining distances NaN (a NaN vector component poisons every
      // comparison): fall back to the lowest unused index so the result
      // stays deterministic instead of crashing on used(-1).
      if (best < 0) {
        best = 0
        while (used(best)) best += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cc = ctx.freshName("cc")
      s"""
         |double[] $dist = new double[$mat.length];
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cc = $mat[$c];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $cc.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      double $t = ((double) $a.$get($i)) - $cc[$i];
         |      $d += $t * $t;
         |    }
         |  }
         |  $dist[$c] = $d;
         |}
         |int[] $out = new int[$k];
         |boolean[] $used = new boolean[$mat.length];
         |for (int $j = 0; $j < $k; $j++) {
         |  int $best = -1;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    if (!$used[$c] && $dist[$c] < $bestD) { $bestD = $dist[$c]; $best = $c; }
         |  }
         |  if ($best < 0) {
         |    $best = 0;
         |    while ($used[$best]) $best++;
         |  }
         |  $used[$best] = true;
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** winnow_fingerprints(s): MOSS-style winnowing fingerprint set of a
  * document — k=8-gram rolling Horner hashes (base 257 mod 1e9+7) over
  * the simple-lowercased, space-stripped CODE POINTS, minimum per
  * w=16-hash sliding window, consecutive duplicates collapsed. A unary
  * codegen'd expression (not mapPartitions) so a corpus-wide fingerprint
  * scan stays inside WholeStageCodegen — the previous Dataset.map
  * version forced a DeserializeToObject/SerializeFromObject pair on the
  * hot path of two gated queries. Interpreted and generated paths share
  * one static core (`WinnowFingerprints.fingerprints`, the HornerHash
  * idiom), so they cannot drift; the same core also serves any
  * plain-Scala caller (streaming, specs). Oracle-portable by
  * construction: pure integer arithmetic over code points — the DuckDB
  * twin recomputes each gram's Horner fold directly and replays the
  * window-min + dedup with SQL window functions, bitwise.
  */
case class WinnowFingerprints(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.fingerprintArray(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WinnowFingerprints.fingerprintArray($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** The winnow core — moved verbatim from TextAnalysis.winnowFingerprints
    * (which now delegates here). See that site's original rationale:
    * SIMPLE lowercase (utf8proc parity on U+0130/final sigma), code-point
    * indexing (DuckDB substr/ord positions), the B^k outgoing weight
    * (the update multiplies by B before subtracting), and the <k-chars
    * whole-string fallback that keeps short docs oracle-gated.
    */
  def fingerprints(text: String): Array[Long] = {
    val k = 8       // gram length (chars)
    val w = 16      // winnow window
    val B = 257L
    val M = 1000000007L
    val s: Array[Int] =
      SimpleLower.lowerString(text).replace(" ", "").codePoints().toArray
    if (s.length < k) {
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * B + s(i)) % M; i += 1 }
      return Array(h)
    }
    var pow = 1L
    (1 to k).foreach(_ => pow = pow * B % M)
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * B + s(i)) % M
      if (i >= k) h = (h - s(i - k) * pow % M + M * B) % M
      if (i >= k - 1) hashes(i - k + 1) = h
      i += 1
    }
    // winnow: minimum hash of each w-sized window, deduped consecutive
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var j = 0
    while (j <= hashes.length - w || (j == 0 && hashes.nonEmpty)) {
      val end = math.min(j + w, hashes.length)
      var mn = Long.MaxValue
      var p = j
      while (p < end) { if (hashes(p) < mn) mn = hashes(p); p += 1 }
      if (out.isEmpty || out.last != mn) out += mn
      j += 1
    }
    out.toArray
  }

  /** Static forwarder for the expression's interpreted and generated
    * paths (callable from generated Java, like HornerHash.foldUtf8).
    */
  def fingerprintArray(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      fingerprints(s.toString))
}

object VectorFunctions {
  /** Register the codegen'd expressions for SQL/expr use on this session
    * (idempotent). horner_hash's modulus must be a foldable literal —
    * it parameterizes the generated code. The matrix-parameterized
    * expressions (hyperplane_signature, nearest_centroid/cells) stay
    * Column-API-only: their constants are runtime arrays, not SQL
    * literals.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "horner_hash", exprs => HornerHash(exprs(0),
        exprs(1).eval() match {
          case l: Long => l
          case i: Int  => i.toLong
          case other => throw new IllegalArgumentException(
            s"horner_hash(s, mod): mod must be an integer literal, got $other")
        }), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simple_lower", exprs => SimpleLower(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", exprs => WinnowFingerprints(exprs(0)), "scala_udf")
  }

  /** Column API: dot_product(a, b) as a codegen'd expression. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
  }

  /** Column API: hyperplane LSH bucket signature of vector `v`. */
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(HyperplaneSignature(GraftSqlBridge.expression(v), planes))
  }

  /** Column API: engine-portable Horner string hash mod `mod`. */
  def hornerHash(s: Column, mod: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(HornerHash(GraftSqlBridge.expression(s), mod))
  }

  /** Column API: engine-portable simple (per-code-point) lowercase —
    * use this, never the built-in `lower()`, wherever the result feeds
    * an oracle-gated value (DuckDB's lower() is the simple mapping).
    */
  def simpleLower(s: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SimpleLower(GraftSqlBridge.expression(s)))
  }

  /** Column API: winnowing fingerprint array (array<bigint>) of a text
    * column — the codegen'd substring-dup fingerprint scan.
    */
  def winnowFingerprints(s: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(s)))
  }

  /** Column API: index of the squared-L2-nearest centroid to vector `v`. */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(NearestCentroid(GraftSqlBridge.expression(v), centroids))
  }

  /** Column API: the k squared-L2-nearest centroid indices to vector `v`. */
  def nearestCells(v: Column, centroids: Array[Array[Double]], k: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(NearestCells(GraftSqlBridge.expression(v), centroids, k))
  }
}
