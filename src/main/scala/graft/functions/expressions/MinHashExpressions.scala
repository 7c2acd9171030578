package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the full MinHash signature — all
  * `numHashes` permutation minima in ONE pass over the shingle-hash array.
  *
  * Why a custom Expression: the higher-order formulation
  * (`array(array_min(transform(hashes, h => pmod(h*a + b, p))) x64)`)
  * interprets 64 separate lambdas per row and allocates 64 intermediate
  * arrays — it was the dominant cost of the MinHash dedup stage. The
  * generated loop reads each hash once and updates the 64 running minima
  * in a primitive long[], inside whole-stage codegen.
  *
  * Semantics mirror the higher-order form: null elements are skipped; a
  * null input array yields null. (An array with no non-null elements
  * yields null — unreachable through `Dedup`, whose shingle pipeline
  * always emits at least one hash.) Inputs are masked to 32 bits HERE
  * (harmless on pre-masked hashes, total on raw 64-bit hashes — unmasked
  * input would otherwise overflow a*h in plain Java arithmetic and emit
  * negative out-of-domain values); with a < 2^29, a*h + b < 2^62.
  */
case class MinHashSig(
    child: Expression,
    a: Seq[Long],
    b: Seq[Long],
    prime: Long) extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i) & 0xFFFFFFFFL
        seen = true
        var j = 0
        while (j < k) {
          val v = (aArr(j) * h + bArr(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val k = aArr.length
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  long $h = $arr.getLong($i) & 0xFFFFFFFFL;
         |  $seen = true;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native 64-bit SimHash from an array of token hashes: one pass keeping
  * 64 counters (+1 when the token hash has bit j set, −1 otherwise), then
  * sign → bit. The higher-order form ran a 64-element `zip_with` merge PER
  * TOKEN through the interpreter; this is a generated two-level primitive
  * loop. Null elements are skipped; an empty array yields 0L (the
  * higher-order aggregate's zero), a null array yields null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashExpressions {

  /** The engine-wide default MinHash configuration — referenced by the
    * Column path (`Dedup`), the SQL surface (`GraftExtensions`), and the
    * tests, so the surfaces cannot drift apart.
    */
  val DefaultNumHashes = 64
  val DefaultSeed = 42L

  /** Universal-hash coefficients (a in [1, 2^29], b in [0, 2^29)), seeded
    * driver-side — the single source for both the expression and the
    * higher-order reference formulation.
    */
  def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (rnd.nextLong(1L << 29) + 1, rnd.nextLong(1L << 29)))
  }

  lazy val defaultParams: Seq[(Long, Long)] =
    hashParams(DefaultNumHashes, DefaultSeed)

  /** Smallest prime > 2^32 (the permutation modulus). */
  val HashPrime = 4294967311L

  // register one SQL function per (numHashes, seed) actually used; the
  // Column path goes through the registry because Column's Expression
  // constructor is sql-private in Spark 4 (same route as vec_dot).
  // createOrReplace is idempotent and runs at query-build time only, so no
  // registration cache is needed.
  // hex-encode the seed: a negative seed rendered with '-' would make the
  // function name unparseable by call_function's identifier parser
  private def fnName(numHashes: Int, seed: Long) =
    s"minhash_sig_${numHashes}_${java.lang.Long.toHexString(seed)}"

  private def register(spark: org.apache.spark.sql.SparkSession,
      numHashes: Int, seed: Long): Unit = {
    val params = hashParams(numHashes, seed)
    SessionFunctions.registerIfAbsent(spark, fnName(numHashes, seed),
      exprs => MinHashSig(exprs.head, params.map(_._1), params.map(_._2), HashPrime))
  }

  /** Column form: full signature from a masked-hash array column. */
  def signature(hashes: Column, numHashes: Int, seed: Long): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(register(_, numHashes, seed))
    org.apache.spark.sql.functions.call_function(fnName(numHashes, seed), hashes)
  }

  /** Column form of [[SimHash64]] over a token-hash array column. */
  def simhash64(tokenHashes: Column): Column =
    SessionFunctions.callRegistered("simhash64",
      exprs => SimHash64(exprs.head), None, tokenHashes)
}
