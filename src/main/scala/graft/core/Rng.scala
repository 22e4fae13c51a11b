package graft.core

/** Counter-based deterministic RNG (SplitMix64).
  *
  * The reference pipeline pins all stochastic steps to a sequential seeded
  * RNG (reference: scripts/synth_night.py:73, mvt/run_mvt_espre.py:408).
  * A sequential stream is partition-order dependent in Spark, so we use a
  * *counter-based* hash RNG keyed by (seed, row id [, stream id]): every row
  * derives its randomness from pure function application, making generated
  * data identical at any parallelism — a precondition for the two-cluster-
  * size scaling evidence and for resume parity (SURVEY.md §7.5.2).
  */
object Rng {
  /** SplitMix64 finalizer: bijective 64-bit mix with good avalanche. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Combine several keys into one 64-bit hash (order-sensitive). */
  def mix(parts: Long*): Long = {
    var h = 0x2545F4914F6CDD1DL
    parts.foreach { p => h = mix64(h ^ p) }
    h
  }

  /** Uniform double in [0, 1) from a hash. */
  def unitDouble(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform double in [0,1) for (seed, row, stream). */
  def uniform(seed: Long, row: Long, stream: Long): Double =
    unitDouble(mix(seed, row, stream))

  /** Uniform int in [0, n) for (seed, row, stream). */
  def nextInt(seed: Long, row: Long, stream: Long, n: Int): Int = {
    require(n > 0)
    (((mix(seed, row, stream) >>> 1) % n).toInt)
  }

  /** Standard normal via Box-Muller on two counter streams. */
  def gaussian(seed: Long, row: Long, stream: Long): Double = {
    val u1 = math.max(uniform(seed, row, stream * 2 + 1), 1e-300)
    val u2 = uniform(seed, row, stream * 2 + 2)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }
}
