package graft.core

/** S2 cell IDs (levels 0–30), implemented from the published S2 geometry
  * math (s2geometry.io — cube-face projection, quadratic s↔u transform,
  * Hilbert curve position). Pure Scala, no dependencies; static methods so
  * Catalyst codegen can call them directly (SURVEY.md §4.2 "batched
  * cell-encode expression").
  *
  * ID layout (64 bits): [3-bit face][2·level bits of Hilbert position]
  * [1][zeros]. The trailing set bit marks the level.
  *
  * Correctness is gated on self-consistency properties (round-trip,
  * parent/child containment, range nesting) per SURVEY.md §7.5.1 — the
  * reference repo ships no spatial fixtures (it is a spectroscopy
  * pipeline; SURVEY.md §0), so parity targets are our own committed
  * fixtures.
  */
object S2 {
  final val MaxLevel = 30
  private final val FaceBits = 3
  private final val PosBits = 2 * MaxLevel + 1 // 61
  private final val MaxSize = 1 << MaxLevel // 2^30

  private final val SwapMask = 0x01
  private final val InvertMask = 0x02

  // Hilbert curve traversal tables (published S2 constants).
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)  // swapped & inverted
  )
  private val ijToPos: Array[Array[Int]] = {
    val inv = Array.ofDim[Int](4, 4)
    var o = 0
    while (o < 4) {
      var p = 0
      while (p < 4) { inv(o)(posToIJ(o)(p)) = p; p += 1 }
      o += 1
    }
    inv
  }
  private val posToOrientation: Array[Int] =
    Array(SwapMask, 0, 0, InvertMask | SwapMask)

  /** Quadratic projection u → s (S2_QUADRATIC_PROJECTION). */
  @inline def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  /** Inverse: s → u. */
  @inline def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  /** Face (0..5) with the largest |component| of the xyz direction. */
  def face(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val f = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val comp = f match { case 0 => x; case 1 => y; case _ => z }
    if (comp < 0) f + 3 else f
  }

  /** Project xyz onto (u,v) of the given face. */
  def faceUV(f: Int, x: Double, y: Double, z: Double): (Double, Double) =
    f match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)   // x < 0
      case 4 => (z / y, -x / y)  // y < 0
      case _ => (-y / z, -x / z) // z < 0
    }

  /** Unit xyz for (face, u, v). */
  def faceUVToXYZ(f: Int, u: Double, v: Double): (Double, Double, Double) =
    f match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  @inline private def stToIJ(s: Double): Int = {
    val i = math.floor(s * MaxSize).toInt
    math.max(0, math.min(MaxSize - 1, i))
  }

  /** Leaf (level-30) cell id from face, i, j. */
  def fromFaceIJ(f: Int, i: Int, j: Int): Long = {
    var n: Long = f.toLong << (PosBits - 1) // 60 bits of position follow
    var bits = f & SwapMask
    var pos = 0L
    var k = MaxLevel - 1
    while (k >= 0) {
      val iBit = (i >>> k) & 1
      val jBit = (j >>> k) & 1
      val ij = (iBit << 1) | jBit
      val p = ijToPos(bits)(ij)
      pos = (pos << 2) | p
      bits ^= posToOrientation(p)
      k -= 1
    }
    n |= pos
    (n << 1) | 1
  }

  /** Decode id → (face, i, j, orientation); works for any level (i,j of the
    * min leaf cell).
    */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val f = (id >>> 61).toInt
    var bits = f & SwapMask
    var i = 0; var j = 0
    var k = MaxLevel - 1
    var pos = (id >>> 1) & ((1L << 60) - 1)
    // walk MSB-first
    var shift = 58
    while (k >= 0) {
      val p = ((pos >>> shift) & 3).toInt
      val ij = posToIJ(bits)(p)
      i = (i << 1) | (ij >>> 1)
      j = (j << 1) | (ij & 1)
      bits ^= posToOrientation(p)
      k -= 1; shift -= 2
    }
    (f, i, j)
  }

  /** Level of a cell id (position of lowest set bit). */
  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** Lowest set bit of the id. */
  @inline def lsb(id: Long): Long = id & -id

  /** Cell id at `level` containing the given lat/lon (degrees). */
  def cellId(latDeg: Double, lonDeg: Double, level: Int): Long = {
    val leaf = leafCellId(latDeg, lonDeg)
    parentAtLevel(leaf, level)
  }

  def leafCellId(latDeg: Double, lonDeg: Double): Long = {
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lonDeg)
    val cosPhi = math.cos(phi)
    val x = math.cos(theta) * cosPhi
    val y = math.sin(theta) * cosPhi
    val z = math.sin(phi)
    val f = face(x, y, z)
    val (u, v) = faceUV(f, x, y, z)
    fromFaceIJ(f, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
  }

  /** Ancestor of `id` at `level` (level must be ≤ level(id)). */
  def parentAtLevel(id: Long, level: Int): Long = {
    val newLsb = 1L << (2 * (MaxLevel - level))
    (id & -newLsb) | newLsb
  }

  /** The four child cells one level down: with L = lsb(id) and
    * L' = L >> 2, child k is centered at id − L + (2k+1)·L', and the
    * four child ranges tile [rangeMin(id), rangeMax(id)] exactly.
    */
  def children(id: Long): Array[Long] = {
    val l = lsb(id)
    require(l > 1, "leaf cell has no children")
    val cl = l >> 2
    Array.tabulate(4)(k => id - l + (2L * k + 1L) * cl)
  }

  /** Range [rangeMin, rangeMax] of leaf ids contained in this cell. */
  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  def contains(parent: Long, child: Long): Boolean =
    child >= rangeMin(parent) && child <= rangeMax(parent)

  /** Center of the cell as (latDeg, lonDeg). */
  def center(id: Long): (Double, Double) = {
    val (f, i, j) = toFaceIJ(id)
    val lvl = level(id)
    // center leaf-coordinates: i,j are the min-leaf; add half the size
    val size = 1 << (MaxLevel - lvl)
    val si = (i & ~(size - 1)) + size / 2
    val sj = (j & ~(size - 1)) + size / 2
    val u = stToUV(si.toDouble / MaxSize)
    val v = stToUV(sj.toDouble / MaxSize)
    val (x, y, z) = faceUVToXYZ(f, u, v)
    val lat = math.atan2(z, math.sqrt(x * x + y * y))
    val lon = math.atan2(y, x)
    (math.toDegrees(lat), math.toDegrees(lon))
  }

  /** A cell id formatted as the canonical face/position token (debug). */
  def token(id: Long): String = java.lang.Long.toHexString(id)
}
