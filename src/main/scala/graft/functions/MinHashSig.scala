package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE scalar expression: split on
  * spaces, xxhash64 each word, combine each n-word window into a shingle
  * hash, and fold k permutation mins — a single tight loop per row.
  *
  * The composed-primitives formulation (explode shingles → groupBy(doc)
  * → k min aggregates) shuffles every shingle row of the corpus just to
  * bring a document's shingles back together — but they START together,
  * on the document row. Doing the whole reduction inside one expression
  * keeps signature computation entirely map-side: no explode blow-up, no
  * shuffle, and the banding/bucketing join that follows is the first
  * exchange in the LSH plan.
  *
  * Hash semantics are bit-identical to the SQL-primitive pipeline
  * (`xxhash64(word)` seed 42; shingle = `xxhash64(h_1..h_n)` chained
  * seeds; `min((pmod(h,p)·a_i + b_i) mod p)`, p = 2³¹−1), so the two
  * paths are interchangeable and cross-checked in FunctionsSpec. */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 2147483647L // 2^31 - 1
  private lazy val coef: Array[(Long, Long)] =
    graft.scale.Dedup.hashCoefficients(k, P).toArray

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    if (words.length < n) return null
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { wh(i) = XXH64.hashUTF8String(words(i), 42L); i += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    val nShingles = words.length - n + 1
    while (s < nShingles) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(wh(s + j), h); j += 1 }
      val x = ((h % P) + P) % P
      var c = 0
      while (c < k) {
        val (a, b) = coef(c)
        val v = (x * a + b) % P
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def apply(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), n, k))
}
