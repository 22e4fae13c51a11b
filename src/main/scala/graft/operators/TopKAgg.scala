package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One tile feature (pre-encode). */
final case class Feat(fkey: Long, lon: Double, lat: Double,
                      kind: String, name: String)

/** Bounded top-K buffer: binary max-heap by (fkey, lon, lat) over parallel
  * arrays — O(log cap) insert, kryo-serializable. Storage GROWS
  * geometrically up to cap: the hash aggregate holds one buffer per
  * in-flight group, and most tiles carry only a few features — a
  * preallocated cap-sized buffer per group would multiply to tens of GB.
  */
final class TopKBuf(val cap: Int) extends Serializable {
  /** Group key (packed tile id), carried so a fused finish() can encode
    * without a second pass over the key column — set by [[TopKTileEncode]],
    * unused by [[TopKFeatures]]. Long.MinValue = not set (0 is a valid
    * tile id: zoom 0).
    */
  var tileId: Long = Long.MinValue
  var n: Int = 0
  private var size0 = math.min(8, cap)
  var fkeys: Array[Long] = new Array[Long](size0)
  var lons: Array[Double] = new Array[Double](size0)
  var lats: Array[Double] = new Array[Double](size0)
  var kinds: Array[String] = new Array[String](size0)
  var names: Array[String] = new Array[String](size0)

  private def grow(): Unit = {
    val newSize = math.min(cap, math.max(8, fkeys.length * 2))
    fkeys = java.util.Arrays.copyOf(fkeys, newSize)
    lons = java.util.Arrays.copyOf(lons, newSize)
    lats = java.util.Arrays.copyOf(lats, newSize)
    kinds = java.util.Arrays.copyOf(kinds, newSize)
    names = java.util.Arrays.copyOf(names, newSize)
  }

  /** true if element i ranks after (greater than) element j. */
  @inline private def gt(i: Int, j: Int): Boolean = {
    if (fkeys(i) != fkeys(j)) fkeys(i) > fkeys(j)
    else if (lons(i) != lons(j)) lons(i) > lons(j)
    else lats(i) > lats(j)
  }

  @inline private def gtv(fk: Long, lo: Double, la: Double, j: Int): Boolean = {
    if (fk != fkeys(j)) fk > fkeys(j)
    else if (lo != lons(j)) lo > lons(j)
    else la > lats(j)
  }

  private def swap(i: Int, j: Int): Unit = {
    val f = fkeys(i); fkeys(i) = fkeys(j); fkeys(j) = f
    val lo = lons(i); lons(i) = lons(j); lons(j) = lo
    val la = lats(i); lats(i) = lats(j); lats(j) = la
    val k = kinds(i); kinds(i) = kinds(j); kinds(j) = k
    val nm = names(i); names(i) = names(j); names(j) = nm
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && gt(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && gt(l, m)) m = l
      if (r < n && gt(r, m)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def offer(fk: Long, lo: Double, la: Double, kind: String, name: String): Unit = {
    if (n < cap) {
      if (n == fkeys.length) grow()
      fkeys(n) = fk; lons(n) = lo; lats(n) = la; kinds(n) = kind; names(n) = name
      n += 1; siftUp(n - 1)
    } else if (!gtv(fk, lo, la, 0)) { // smaller than current max → replace root
      fkeys(0) = fk; lons(0) = lo; lats(0) = la; kinds(0) = kind; names(0) = name
      siftDown(0)
    }
  }

  def mergeFrom(o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.n) { offer(o.fkeys(i), o.lons(i), o.lats(i), o.kinds(i), o.names(i)); i += 1 }
    this
  }

  /** Ascending (fkey, lon, lat) order. */
  def toSorted: Array[Feat] = {
    val out = Array.tabulate(n)(i => Feat(fkeys(i), lons(i), lats(i), kinds(i), names(i)))
    scala.util.Sorting.stableSort(out,
      (a: Feat, b: Feat) => a.fkey < b.fkey ||
        (a.fkey == b.fkey && (a.lon < b.lon || (a.lon == b.lon && a.lat < b.lat))))
    out
  }
}

/** Typed Aggregator: exact deterministic top-`cap` features per tile with
  * MAP-SIDE PARTIAL AGGREGATION — every input partition pre-reduces a hot
  * tile to ≤cap rows before the shuffle, so dense urban tiles cannot
  * create shuffle stragglers (the BASELINE.json skew gate, expressed as a
  * combiner instead of explicit salting; AQE remains the backstop).
  */
class TopKFeatures(cap: Int)
    extends Aggregator[Feat, TopKBuf, Array[Feat]] {
  override def zero: TopKBuf = new TopKBuf(cap)
  override def reduce(b: TopKBuf, a: Feat): TopKBuf = {
    b.offer(a.fkey, a.lon, a.lat, a.kind, a.name); b
  }
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = b1.mergeFrom(b2)
  override def finish(b: TopKBuf): Array[Feat] = b.toSorted
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[Array[Feat]] = Encoders.kryo[Array[Feat]]
}

/** [[TopKFeatures]] with the MVT encode FUSED into finish(): the
  * aggregator emits the finished TileRow (product-encoded — Tungsten
  * binary for mvt_bytes), so the per-tile feature buffer never makes the
  * kryo round trip between an agg output row and a downstream map. On
  * the 200k-page profile that round trip (serialize + deserialize ~1M
  * Feat objects) was the single largest pipeline cost — bigger than the
  * shuffle or the byte encoding itself. Input carries the group key per
  * row (the buffer remembers it) because an Aggregator's finish sees
  * only the buffer, never the key. Byte output is identical to
  * TopKFeatures + encode (TilerSpec pyramid-parity pins it).
  */
class TopKTileEncode(cap: Int, layerName: String)
    extends Aggregator[(Long, Feat), TopKBuf, TileRow] {
  override def zero: TopKBuf = new TopKBuf(cap)
  override def reduce(b: TopKBuf, a: (Long, Feat)): TopKBuf = {
    b.tileId = a._1
    b.offer(a._2.fkey, a._2.lon, a._2.lat, a._2.kind, a._2.name); b
  }
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    if (b1.tileId == Long.MinValue) b1.tileId = b2.tileId
    b1.mergeFrom(b2)
  }
  override def finish(b: TopKBuf): TileRow =
    Tiler.encodeOne(b.tileId, b.toSorted, layerName)
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[TileRow] = Encoders.product[TileRow]
}

/** [[TopKTileEncode]] for the DELTA layout: finish() also keeps the
  * sorted buffer as the mergeable `feats` column (product-encoded
  * array<struct> — what the parquet commit needs anyway).
  */
class TopKTileEncodeF(cap: Int, layerName: String)
    extends Aggregator[(Long, Feat), TopKBuf, TileRowF] {
  override def zero: TopKBuf = new TopKBuf(cap)
  override def reduce(b: TopKBuf, a: (Long, Feat)): TopKBuf = {
    b.tileId = a._1
    b.offer(a._2.fkey, a._2.lon, a._2.lat, a._2.kind, a._2.name); b
  }
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    if (b1.tileId == Long.MinValue) b1.tileId = b2.tileId
    b1.mergeFrom(b2)
  }
  override def finish(b: TopKBuf): TileRowF = {
    val fs = b.toSorted
    val t = Tiler.encodeOne(b.tileId, fs, layerName)
    TileRowF(t.zoom, t.x, t.y, t.n_features, t.mvt_bytes, fs)
  }
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[TileRowF] = Encoders.product[TileRowF]
}
