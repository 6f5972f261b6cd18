package graft.core

/** The repo's ONE fixed-seed pseudo-random generator for synthetic
  * fixtures (decision-oracle queries, specs, property inputs): a 64-bit
  * LCG (Knuth MMIX multiplier/increment). Centralized so a fixture and
  * its spec twin can never drift apart on generator details — the
  * sequence is part of the oracle contract for `m3_decision` /
  * `m9_decision`, so the constants and shaping here must never change. */
object DetRandom {
  final val Mult = 6364136223846793005L
  final val Inc  = 1442695040888963407L

  /** Raw 53-bit stream: x ← x·A + C; emit x >>> 11. */
  def longs(seed: Long): () => Long = {
    var x = seed
    () => { x = x * Mult + Inc; x >>> 11 }
  }

  /** Uniform(−0.5, 0.5) doubles over the same stream. */
  def doubles(seed: Long): () => Double = {
    val next = longs(seed)
    () => next().toDouble / (1L << 53) - 0.5
  }
}
