package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 64-bit SimHash as ONE scalar expression: split on
  * spaces, xxhash64 each token, accumulate ±1 per bit, take signs —
  * the same reduction the [[graft.scale.Dedup]] typed Aggregator runs,
  * but computed where the tokens already live (the document row), so
  * the fingerprint stage is map-side with no token explode or shuffle.
  * Token-hash semantics match the aggregation path bit-for-bit
  * (`xxhash64(token)`, seed 42, multiset — repeated tokens count). */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = XXH64.hashUTF8String(words(i), 42L)
      var b = 0
      while (b < 64) { counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(text)))
}
