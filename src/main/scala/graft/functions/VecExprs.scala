package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}

/** Native Catalyst expression: dot product of two float vectors,
  * accumulated in f64 — the tensor kernel the reference delegates to
  * DL4J/ND4J (`/root/reference/README.md:2`). A custom `Expression` with
  * `doGenCode` (SURVEY.md §4.3 escalation path (b)): the whole-stage-
  * codegen'd loop replaces the interpreted `zip_with`+`aggregate`
  * higher-order pipeline, which evaluates a lambda per element.
  *
  * Semantics are bit-identical to the HOF formulation (sequential
  * left-to-right f64 adds of exactly-promoted f32 products), so DuckDB
  * oracle parity is unaffected.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // ExpectsInputTypes is unavailable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]), so validate explicitly: the
  // function is registered session-wide and must reject e.g.
  // array<double>, which getFloat would otherwise misread silently.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = ArrayType(FloatType, containsNull = true)
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString} (expected ${ok.simpleString})")
    }
  }
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Popcount of the bitwise AND of two long-array bitmaps — the set
  * intersection kernel for dictionary-encoded gram sets whose vocabulary
  * exceeds 64 bits (the single-long `bit_count(ma & mb)` fast path).
  * Codegen'd tight loop over the packed words; equivalent to
  * `size(array_intersect(...))` on the decoded sets but does 64 set
  * members per AND+popcount instead of one hash probe per member. */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_bitmap_and_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of a token array in ONE pass: numHashes seeded
  * xxhash64 minima, bit-identical to
  * `array_min(transform(toks, t -> xxhash64(lit(j), t)))` for
  * j = 0..numHashes-1 (Spark's multi-arg xxhash64 chains the seed:
  * hash(j, 42) becomes the seed for hash(tok, ·) — reproduced here with
  * the same XxHash64Function), but hashes each token once per j without
  * an interpreted lambda per element or a materialized hash array per
  * doc. Interpreted eval (CodegenFallback): per-row cost is the hash
  * work itself. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  // xxhash64(lit(j), tok) == hash(tok, seed = hash(j: Int, seed = 42))
  private lazy val seeds: Array[Long] = Array.tabulate(numHashes) { j =>
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      j, org.apache.spark.sql.types.IntegerType, 42L)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val tok = arr.getUTF8String(t)
      var j = 0
      while (j < numHashes) {
        // A null element matches the documented HOF semantics: xxhash64 of
        // a null value leaves the running seed unchanged, so the candidate
        // for hash j is seeds(j) itself.
        val h =
          if (tok == null) seeds(j)
          else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            tok, StringType, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash (Charikar 2002) of a token array in ONE pass: each
  * token is xxhash64'd once (Spark's XxHash64, seed 42 — identical to
  * the SQL builtin) and votes all 64 signature bits. The equivalent
  * nested higher-order formulation re-hashes every token once per bit
  * (64× the hash work) with an interpreted lambda per step; this
  * expression replaced it at identical semantics. Interpreted eval
  * (CodegenFallback): the per-row cost is ~|tokens| hash calls, already
  * negligible. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val tok = arr.getUTF8String(t)
      if (tok != null) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          tok, org.apache.spark.sql.types.StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
