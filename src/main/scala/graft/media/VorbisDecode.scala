package graft.media

import scala.util.control.NonFatal

/**
 * Vorbis I payload decoder (Ogg/Vorbis → PCM) — pure JVM, total on hostile
 * bytes, implemented from the public Vorbis I specification (Xiph.Org,
 * "Vorbis I specification") and RFC 3533 (Ogg framing). Unlike MP3/AAC,
 * Vorbis is fully implementable from the wire format alone: every Huffman
 * codebook rides IN the stream's setup header (spec §4.2.4), the lapped
 * window is formula-defined (§4.3.1), and the floor-curve dB table follows
 * a closed formula (see `inverseDb`). The same grounds justified building
 * the VP8L raster decoder (WebpDecode.scala).
 *
 * Scope: floor type 1 (every modern encoder; floor 0's LSP synthesis is
 * legacy — streams using it decode to None), residue types 0/1/2, mapping
 * type 0 with magnitude/angle coupling, long/short block switching with
 * correct lapping arithmetic and end-granule truncation. The reference
 * (ocr_processor) treats media as opaque attachments; this decoder exists
 * for the media-curation tier (audio stats/fingerprints over crawl data).
 *
 * Totality: all reads are bounds-checked (a truncated packet decodes what
 * it can, per spec §1.1.3 "end-of-packet is not an error"), structural
 * caps bound memory on hostile headers (channels ≤ 16, blocksize ≤ 8192,
 * codebook entries ≤ 1<<20, total interleaved output values — frames ×
 * channels — ≤ `maxSamples`), and any malformed structure yields None,
 * never a throw.
 */
object VorbisDecode {

  /** Decoded stream: interleaved PCM normalized to u8 (128 = silence, the
    * FlacDecode/WavDecode convention for MediaSniff.features), plus integer
    * decode evidence for closed-form oracles: `floorYSum` is the sum of all
    * floor1 Y values read from the bitstream (every frame, every channel) —
    * it proves the Huffman/floor machinery byte-exactly even when the
    * residue is silent; `sumAbsMicro`/`peakMicro` are Σ⌊|pcm|·10⁶⌋ and
    * max⌊|pcm|·10⁶⌋ over float samples before u8 quantization. */
  final case class Pcm(sampleRate: Int, channels: Int, frames: Long,
                       nPackets: Int, floorYSum: Long,
                       sumAbsMicro: Long, peakMicro: Long,
                       data: Array[Byte])

  private val MaxChannels = 16
  private val MaxCodebooks = 256
  private val MaxEntries = 1 << 20
  private val DefaultMaxSamples = 1 << 22 // ~4M samples/channel ≈ 95 s @44.1k

  def decode(b: Array[Byte], maxSamples: Int = DefaultMaxSamples): Option[Pcm] =
    try decodeImpl(b, maxSamples) catch { case NonFatal(_) => None }

  // ------------------------------------------------------------ Ogg framing

  /** Packet assembly per RFC 3533: lacing values chain (255 ⇒ continues),
    * packets may span pages (header flag 0x01). Returns the packet list and
    * the final granule position (last page with granule ≥ 0). */
  private def oggPackets(b: Array[Byte]): Option[(Array[Array[Byte]], Long)] = {
    val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var partial = new java.io.ByteArrayOutputStream()
    var open = false // a packet is mid-assembly
    var lastGranule = -1L
    var pos = 0
    var total = 0L
    while (pos + 27 <= b.length &&
           b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' && b(pos + 3) == 'S') {
      var granule = 0L
      var k = 7
      while (k >= 0) { granule = (granule << 8) | (b(pos + 6 + k) & 0xffL); k -= 1 }
      val continued = (b(pos + 5) & 0x01) != 0
      val nSegs = b(pos + 26) & 0xff
      if (pos + 27 + nSegs > b.length) return Some((packets.toArray, lastGranule))
      if (!continued && open) { partial = new java.io.ByteArrayOutputStream(); open = false }
      var off = pos + 27 + nSegs
      var s = 0
      var ok = true
      while (s < nSegs && ok) {
        val lace = b(pos + 27 + s) & 0xff
        val avail = math.min(lace, b.length - off)
        if (avail > 0) partial.write(b, off, avail)
        total += avail
        if (total > (64L << 20)) return None // 64 MB packet-bytes cap
        off += lace
        if (avail < lace) ok = false // truncated page: keep prefix, stop
        else if (lace < 255) {
          packets += partial.toByteArray
          partial = new java.io.ByteArrayOutputStream()
          open = false
        } else open = true
        s += 1
      }
      if (granule != -1L) lastGranule = granule
      if (!ok) return Some((packets.toArray, lastGranule))
      pos = off
    }
    if (open && partial.size > 0) packets += partial.toByteArray
    Some((packets.toArray, lastGranule))
  }

  // ------------------------------------------------------------- bit reader

  /** LSb-first bit reader (Vorbis bitpacking, spec §2). Reads past the end
    * return -1 (end-of-packet condition — callers stop cleanly). */
  private final class BitReader(b: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    var eop = false
    def read(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        if (bytePos >= b.length) { eop = true; return -1 }
        val avail = 8 - bitPos
        val take = math.min(avail, n - got)
        val bits = ((b(bytePos) & 0xff) >>> bitPos) & ((1 << take) - 1)
        v |= bits << got
        got += take
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
    def readLong(n: Int): Long = {
      if (n <= 24) { val v = read(n); if (eop) -1L else v.toLong }
      else {
        val lo = read(24); val hi = read(n - 24)
        if (eop) -1L else (lo.toLong & 0xffffff) | (hi.toLong << 24)
      }
    }
    def readBit(): Int = read(1)
  }

  /** ilog per spec §9.2.1: position of the highest set bit (ilog(0)=0). */
  private def ilog(v0: Int): Int = {
    var v = v0; var r = 0
    while (v > 0) { r += 1; v >>>= 1 }
    r
  }

  /** float32_unpack (spec §9.2.2): Vorbis' packed float for codebook
    * min/delta values. */
  private def float32Unpack(x: Long): Float = {
    val mant = (x & 0x1fffff).toDouble
    val sign = (x & 0x80000000L) != 0
    val exp = ((x & 0x7fe00000L) >>> 21).toInt
    val m = if (sign) -mant else mant
    (m * StrictMath.pow(2.0, (exp - 788).toDouble)).toFloat
  }

  // -------------------------------------------------------------- codebooks

  /** A parsed codebook: canonical Huffman codewords (assigned per spec
    * §3.2.1 — each used entry takes the lowest-valued free leaf of its
    * depth in a binary tree filled left to right) plus optional VQ lookup
    * vectors. `decodeMap` keys are (len<<32 | codeword). */
  private final class Codebook(val dims: Int, val entries: Int,
                               val decodeMap: java.util.HashMap[java.lang.Long, Integer],
                               val maxLen: Int,
                               val vq: Array[Array[Float]]) {
    /** Huffman-decode one scalar (entry number); -1 on EOP/invalid. */
    def scalar(r: BitReader): Int = {
      var word = 0L
      var len = 0
      while (len < maxLen) {
        val bit = r.readBit()
        if (bit < 0) return -1
        word = (word << 1) | bit
        len += 1
        val e = decodeMap.get((len.toLong << 32) | word)
        if (e != null) return e.intValue()
      }
      -1
    }
  }

  /** Assign canonical codewords for `lengths` (0 = unused entry), per spec
    * §3.2.1: entries are processed in order and each takes the LOWEST free
    * leaf of its depth in a binary tree filled left to right. Returns (null,
    * 0) when the tree is over- or under-specified (both are errors per
    * spec); a book with exactly one used entry gets codeword 0 at its
    * stated length (the spec's sanctioned special case).
    *
    * Representation: the free portion of the tree is a list of disjoint
    * free subtrees in tree order. Invariant: their depths strictly DECREASE
    * left to right (assigning the leftmost fit replaces one subtree by its
    * right-siblings along the all-left path, depths L..d+1, preserving the
    * order) — so the list never exceeds 32 nodes and each assignment scans
    * at most 32. */
  private[media] def buildCodewords(lengths: Array[Int]): (java.util.HashMap[java.lang.Long, Integer], Int) = {
    val map = new java.util.HashMap[java.lang.Long, Integer]()
    var maxLen = 0
    val used = lengths.count(_ > 0)
    if (used == 0) return (map, 0)
    if (used == 1) {
      val e = lengths.indexWhere(_ > 0)
      map.put((lengths(e).toLong << 32) | 0L, Integer.valueOf(e))
      return (map, lengths(e))
    }
    // parallel arrays as the subtree list: word value + depth, tree order
    val freeWord = new Array[Long](40)
    val freeDepth = new Array[Int](40)
    var nFree = 1 // the whole tree: word 0 at depth 0
    var e = 0
    while (e < lengths.length) {
      val len = lengths(e)
      if (len > 0) {
        if (len > 32) return (null, 0)
        // leftmost free subtree shallow enough to host a depth-len leaf
        var i = 0
        while (i < nFree && freeDepth(i) > len) i += 1
        if (i == nFree) return (null, 0) // overspecified
        val w = freeWord(i)
        val d = freeDepth(i)
        map.put((len.toLong << 32) | (w << (len - d)), Integer.valueOf(e))
        if (len > maxLen) maxLen = len
        // replace slot i with right-siblings along the all-left path:
        // depths len, len-1, ..., d+1 (leftmost = deepest first)
        val add = len - d
        if (nFree - 1 + add > freeWord.length) return (null, 0) // cannot happen (≤33)
        // shift the tail right by (add - 1)
        System.arraycopy(freeWord, i + 1, freeWord, i + add, nFree - i - 1)
        System.arraycopy(freeDepth, i + 1, freeDepth, i + add, nFree - i - 1)
        var dd = len
        var j = i
        while (dd > d) {
          freeWord(j) = (w << (dd - d)) | 1L
          freeDepth(j) = dd
          dd -= 1
          j += 1
        }
        nFree += add - 1
      }
      e += 1
    }
    if (nFree != 0) return (null, 0) // underspecified
    (map, maxLen)
  }

  /** Parse one codebook from the setup header (spec §3.2.1). */
  private def parseCodebook(r: BitReader): Codebook = {
    if (r.read(24) != 0x564342) return null // "BCV" sync
    val dims = r.read(16)
    val entries = r.read(24)
    if (r.eop || dims <= 0 || dims > 64 || entries < 0 || entries > MaxEntries) return null
    val lengths = new Array[Int](entries)
    val ordered = r.readBit()
    if (ordered == 0) {
      val sparse = r.readBit()
      var i = 0
      while (i < entries) {
        if (sparse == 1) {
          val flag = r.readBit()
          if (flag < 0) return null
          lengths(i) = if (flag == 1) r.read(5) + 1 else 0
        } else lengths(i) = r.read(5) + 1
        if (r.eop) return null
        i += 1
      }
    } else {
      var curLen = r.read(5) + 1
      var i = 0
      while (i < entries) {
        val num = r.read(ilog(entries - i))
        if (r.eop || num < 0 || i + num > entries) return null
        var j = 0
        while (j < num) { lengths(i + j) = curLen; j += 1 }
        i += num
        curLen += 1
        if (curLen > 33) return null
      }
    }
    val (map, maxLen) = buildCodewords(lengths)
    if (map == null) return null
    // lookup table
    val lookupType = r.read(4)
    var vq: Array[Array[Float]] = null
    if (lookupType == 1 || lookupType == 2) {
      val min = float32Unpack(r.readLong(32) & 0xffffffffL)
      val delta = float32Unpack(r.readLong(32) & 0xffffffffL)
      val valueBits = r.read(4) + 1
      val seqP = r.readBit()
      if (r.eop || entries.toLong * dims > (1L << 22)) return null // VQ memory cap
      val nVals =
        if (lookupType == 1) {
          // lookup1_values: largest v with v^dims ≤ entries
          var v = 0
          while (StrictMath.pow((v + 1).toDouble, dims.toDouble) <= entries.toDouble) v += 1
          v
        } else entries * dims
      if (r.eop || nVals < 0 || nVals > MaxEntries) return null
      val mults = new Array[Int](nVals)
      var i = 0
      while (i < nVals) {
        mults(i) = r.read(valueBits)
        if (r.eop) return null
        i += 1
      }
      vq = new Array[Array[Float]](entries)
      var e = 0
      while (e < entries) {
        val vec = new Array[Float](dims)
        if (lookupType == 1) {
          var last = 0f
          var idxDiv = 1
          var d = 0
          while (d < dims) {
            val off = (e / idxDiv) % nVals
            vec(d) = mults(off) * delta + min + last
            if (seqP == 1) last = vec(d)
            idxDiv *= nVals
            d += 1
          }
        } else {
          var last = 0f
          var d = 0
          while (d < dims) {
            vec(d) = mults(e * dims + d) * delta + min + last
            if (seqP == 1) last = vec(d)
            d += 1
          }
        }
        vq(e) = vec
        e += 1
      }
    } else if (lookupType != 0) return null
    new Codebook(dims, entries, map, maxLen, vq)
  }

  // ----------------------------------------------------------------- floor1

  /** Floor type 1 configuration (spec §7.2.2). */
  private final class Floor1(val partitionClasses: Array[Int],
                             val classDims: Array[Int],
                             val classSubclasses: Array[Int],
                             val classMasterbooks: Array[Int],
                             val subclassBooks: Array[Array[Int]],
                             val multiplier: Int,
                             val xList: Array[Int]) {
    val values: Int = xList.length
    // sorted order of xList positions (spec: "vector [floor1_x_list] is not
    // necessarily sorted, decode uses the sorted order")
    val sortIdx: Array[Int] = xList.indices.sortBy(xList(_)).toArray
    // low/high neighbor tables for positions ≥ 2 (spec §9.2.4/9.2.5)
    val lowNbr: Array[Int] = Array.tabulate(values) { i =>
      if (i < 2) 0
      else {
        var best = -1
        var j = 0
        while (j < i) {
          if (xList(j) < xList(i) && (best < 0 || xList(j) > xList(best))) best = j
          j += 1
        }
        best
      }
    }
    val highNbr: Array[Int] = Array.tabulate(values) { i =>
      if (i < 2) 0
      else {
        var best = -1
        var j = 0
        while (j < i) {
          if (xList(j) > xList(i) && (best < 0 || xList(j) < xList(best))) best = j
          j += 1
        }
        best
      }
    }
  }

  private def parseFloor1(r: BitReader): Floor1 = {
    val partitions = r.read(5)
    if (r.eop || partitions < 0) return null
    val partitionClasses = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      partitionClasses(i) = r.read(4)
      if (partitionClasses(i) > maxClass) maxClass = partitionClasses(i)
      i += 1
    }
    val nClasses = maxClass + 1
    val classDims = new Array[Int](nClasses)
    val classSubclasses = new Array[Int](nClasses)
    val classMasterbooks = new Array[Int](nClasses)
    val subclassBooks = new Array[Array[Int]](nClasses)
    i = 0
    while (i < nClasses) {
      classDims(i) = r.read(3) + 1
      classSubclasses(i) = r.read(2)
      classMasterbooks(i) = if (classSubclasses(i) > 0) r.read(8) else -1
      val n = 1 << classSubclasses(i)
      subclassBooks(i) = new Array[Int](n)
      var j = 0
      while (j < n) { subclassBooks(i)(j) = r.read(8) - 1; j += 1 }
      if (r.eop) return null
      i += 1
    }
    val multiplier = r.read(2) + 1
    val rangeBits = r.read(4)
    if (r.eop) return null
    val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangeBits)
    i = 0
    while (i < partitions) {
      val c = partitionClasses(i)
      var j = 0
      while (j < classDims(c)) {
        xs += r.read(rangeBits)
        j += 1
      }
      i += 1
    }
    if (r.eop || xs.length > 65) return null
    // spec: all X values must be unique
    if (xs.distinct.length != xs.length) return null
    new Floor1(partitionClasses, classDims, classSubclasses, classMasterbooks,
      subclassBooks, multiplier, xs.toArray)
  }

  // ---------------------------------------------------------------- residue

  /** Residue configuration, types 0/1/2 (spec §8.6.1). */
  private final class Residue(val typ: Int, val begin: Int, val end: Int,
                              val partitionSize: Int, val classifications: Int,
                              val classbook: Int, val cascade: Array[Int],
                              val books: Array[Array[Int]])

  private def parseResidue(r: BitReader, typ: Int): Residue = {
    val begin = r.read(24)
    val end = r.read(24)
    val partitionSize = r.read(24) + 1
    val classifications = r.read(6) + 1
    val classbook = r.read(8)
    if (r.eop || begin < 0 || end < begin || partitionSize <= 0) return null
    val cascade = new Array[Int](classifications)
    var i = 0
    while (i < classifications) {
      val low = r.read(3)
      val flag = r.readBit()
      val high = if (flag == 1) r.read(5) else 0
      if (r.eop) return null
      cascade(i) = (high << 3) | low
      i += 1
    }
    val books = new Array[Array[Int]](classifications)
    i = 0
    while (i < classifications) {
      books(i) = new Array[Int](8)
      var p = 0
      while (p < 8) {
        books(i)(p) = if ((cascade(i) & (1 << p)) != 0) r.read(8) else -1
        p += 1
      }
      if (r.eop) return null
      i += 1
    }
    new Residue(typ, begin, end, partitionSize, classifications, classbook, cascade, books)
  }

  // ---------------------------------------------------------- mapping/modes

  private final class Mapping(val submaps: Int, val couplingMag: Array[Int],
                              val couplingAng: Array[Int], val mux: Array[Int],
                              val submapFloor: Array[Int], val submapResidue: Array[Int])

  private def parseMapping(r: BitReader, channels: Int,
                           nFloors: Int, nResidues: Int): Mapping = {
    val submaps = if (r.readBit() == 1) r.read(4) + 1 else 1
    var couplingMag: Array[Int] = Array.emptyIntArray
    var couplingAng: Array[Int] = Array.emptyIntArray
    if (r.readBit() == 1) {
      val steps = r.read(8) + 1
      if (r.eop || steps < 0) return null
      couplingMag = new Array[Int](steps)
      couplingAng = new Array[Int](steps)
      val bits = ilog(channels - 1)
      var i = 0
      while (i < steps) {
        couplingMag(i) = r.read(bits)
        couplingAng(i) = r.read(bits)
        if (r.eop || couplingMag(i) >= channels || couplingAng(i) >= channels ||
            couplingMag(i) == couplingAng(i)) return null
        i += 1
      }
    }
    if (r.read(2) != 0) return null // reserved
    val mux = new Array[Int](channels)
    if (submaps > 1) {
      var i = 0
      while (i < channels) {
        mux(i) = r.read(4)
        if (mux(i) >= submaps) return null
        i += 1
      }
    }
    val submapFloor = new Array[Int](submaps)
    val submapResidue = new Array[Int](submaps)
    var i = 0
    while (i < submaps) {
      r.read(8) // unused time configuration
      submapFloor(i) = r.read(8)
      submapResidue(i) = r.read(8)
      if (r.eop || submapFloor(i) >= nFloors || submapResidue(i) >= nResidues) return null
      i += 1
    }
    new Mapping(submaps, couplingMag, couplingAng, mux, submapFloor, submapResidue)
  }

  private final class Mode(val blockFlag: Int, val mapping: Int)

  // ------------------------------------------------------------ setup state

  private final class Setup(val channels: Int, val sampleRate: Int,
                            val blocksizes: Array[Int],
                            val codebooks: Array[Codebook],
                            val floors: Array[Floor1],
                            val residues: Array[Residue],
                            val mappings: Array[Mapping],
                            val modes: Array[Mode])

  // ------------------------------------------------------- floor1 synthesis

  /** inverse_db_table (spec §7.2.1): 256 amplitudes spanning ≈ -139.45 dB
    * to 0 dB. The printed table follows the closed formula
    * table[i] = 10^(7·(i−255)/256)  (check: i=0 → 10^(−6.97266) =
    * 1.0649863e−07, the spec's first entry; i=255 → 1.0) — generated here
    * rather than transcribed. */
  private val inverseDb: Array[Float] = Array.tabulate(256) { i =>
    StrictMath.pow(10.0, 7.0 * (i - 255) / 256.0).toFloat
  }

  /** render_point (spec §9.2.6): integer line interpolation at X. */
  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = if (adx == 0) 0 else err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** render_line (spec §9.2.6) writing dB INDICES into `v` over [x0, x1). */
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int, v: Array[Int]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    if (adx <= 0) return
    var ady = math.abs(dy)
    val base = dy / adx
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 >= 0 && x0 < v.length) v(x0) = y
    var x = x0 + 1
    while (x < x1) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      if (x >= 0 && x < v.length) v(x) = y
      x += 1
    }
  }

  /** Decode one channel's floor1 data from the packet (spec §7.2.3) and
    * synthesize the curve (§7.2.4). Returns (curve of length n2 or null if
    * the floor is unused this frame, Σ of the raw Y values read). */
  private def floor1Decode(r: BitReader, f: Floor1, books: Array[Codebook],
                           n2: Int): (Array[Float], Long) = {
    if (r.readBit() != 1) return (null, 0L)
    val range = f.multiplier match {
      case 1 => 256; case 2 => 128; case 3 => 86; case _ => 64
    }
    val yBits = ilog(range - 1)
    val y = new Array[Int](f.values)
    y(0) = r.read(yBits)
    y(1) = r.read(yBits)
    if (r.eop) return (null, 0L)
    var ySum = y(0).toLong + y(1).toLong
    var offset = 2
    var p = 0
    while (p < f.partitionClasses.length) {
      val c = f.partitionClasses(p)
      val cdim = f.classDims(c)
      val cbits = f.classSubclasses(c)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) {
        val mb = f.classMasterbooks(c)
        if (mb < 0 || mb >= books.length || books(mb) == null) return (null, 0L)
        cval = books(mb).scalar(r)
        if (cval < 0) return (null, ySum)
      }
      var j = 0
      while (j < cdim) {
        val bk = f.subclassBooks(c)(cval & csub)
        cval >>>= cbits
        if (bk >= 0) {
          if (bk >= books.length || books(bk) == null) return (null, ySum)
          val v = books(bk).scalar(r)
          if (v < 0) return (null, ySum) // EOP: frame renders silent
          y(offset + j) = v
        } else y(offset + j) = 0
        ySum += y(offset + j)
        j += 1
      }
      offset += cdim
      p += 1
    }
    // amplitude value synthesis (step 2)
    val finalY = new Array[Int](f.values)
    val step2 = new Array[Boolean](f.values)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    var i = 2
    while (i < f.values) {
      val lo = f.lowNbr(i); val hi = f.highNbr(i)
      val predicted = renderPoint(f.xList(lo), finalY(lo), f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        val raw =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) >> 1)
          else predicted + (v >> 1)
        // clamp into the multiplier range: an out-of-room codebook value
        // must not feed later render_point predictions (or the dB index)
        // with an escaped amplitude
        finalY(i) = math.max(0, math.min(range - 1, raw))
      } else { step2(i) = false; finalY(i) = predicted }
      i += 1
    }
    // curve synthesis (step 3) in sorted X order
    val idxCurve = new Array[Int](n2)
    var lx = 0
    var ly = math.max(0, math.min(255, finalY(f.sortIdx(0)))) * f.multiplier
    var k = 1
    var hx = 0
    while (k < f.values) {
      val j = f.sortIdx(k)
      if (step2(j)) {
        val hy = math.max(0, math.min(255 / f.multiplier, finalY(j))) * f.multiplier
        hx = f.xList(j)
        renderLine(lx, ly, math.min(hx, n2), hy, idxCurve)
        lx = math.min(hx, n2); ly = hy
      }
      k += 1
    }
    if (lx < n2) { var x = lx; while (x < n2) { idxCurve(x) = ly; x += 1 } }
    val curve = new Array[Float](n2)
    i = 0
    while (i < n2) {
      curve(i) = inverseDb(math.max(0, math.min(255, idxCurve(i))))
      i += 1
    }
    (curve, ySum)
  }

  // --------------------------------------------------------- residue decode

  /** Decode residue (spec §8.6.2) into `vecs` (each length n; type 2 gets
    * ONE vector of length channels·n passed in). `doNot(j)` marks vectors
    * whose floor was unused. Stops cleanly at EOP keeping partial sums. */
  private def residueDecode(r: BitReader, res: Residue, books: Array[Codebook],
                            vecs: Array[Array[Float]], doNot: Array[Boolean]): Unit = {
    val n = vecs(0).length
    val limitBegin = math.min(res.begin, n)
    val limitEnd = math.min(res.end, n)
    val nToRead = limitEnd - limitBegin
    if (nToRead <= 0) return
    if (res.classbook < 0 || res.classbook >= books.length || books(res.classbook) == null) return
    val cb = books(res.classbook)
    val cdim = math.max(1, cb.dims)
    val partitionsToRead = nToRead / res.partitionSize
    if (partitionsToRead <= 0) return
    val nv = vecs.length
    val classif = Array.ofDim[Int](nv, partitionsToRead + cdim)
    var pass = 0
    while (pass < 8) {
      var partition = 0
      while (partition < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nv) {
            if (!doNot(j)) {
              var temp = cb.scalar(r)
              if (temp < 0) return // EOP
              var i = cdim - 1
              while (i >= 0) {
                classif(j)(partition + i) = temp % res.classifications
                temp /= res.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < cdim && partition < partitionsToRead) {
          var j = 0
          while (j < nv) {
            if (!doNot(j)) {
              val c = classif(j)(partition)
              val bkId = if (c < res.books.length) res.books(c)(pass) else -1
              if (bkId >= 0) {
                if (bkId >= books.length || books(bkId) == null || books(bkId).vq == null) return
                val bk = books(bkId)
                val offset = limitBegin + partition * res.partitionSize
                if (res.typ == 0) {
                  // format 0: interleaved stride
                  val step = res.partitionSize / bk.dims
                  var s = 0
                  while (s < step) {
                    val e = bk.scalar(r)
                    if (e < 0) return
                    val vq = bk.vq(e)
                    var d = 0
                    while (d < bk.dims) {
                      val at = offset + s + d * step
                      if (at < n) vecs(j)(at) += vq(d)
                      d += 1
                    }
                    s += 1
                  }
                } else {
                  // format 1 (types 1 and 2): contiguous
                  var k = 0
                  while (k < res.partitionSize) {
                    val e = bk.scalar(r)
                    if (e < 0) return
                    val vq = bk.vq(e)
                    var d = 0
                    while (d < bk.dims && k < res.partitionSize) {
                      val at = offset + k
                      if (at < n) vecs(j)(at) += vq(d)
                      d += 1
                      k += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          partition += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  // ------------------------------------------------------------------ iMDCT

  /** Inverse MDCT dispatch: the O(n log n) FFT path for long blocks, the
    * direct sum for short ones (FFT overhead isn't worth it below ~512 and
    * the direct form doubles as the spec's independent oracle). Both
    * evaluate y[j] = Σ_k X[k]·cos(π/(2n)·(2j+1+n/2)·(2k+1)) (spec §4.3.7);
    * VorbisDecodeSpec pins their agreement across all legal block sizes. */
  private[media] def imdct(x: Array[Float], n: Int): Array[Float] =
    if (n >= 512) imdctFft(x, n) else imdctDirect(x, n)

  /** Direct O(n²) inverse MDCT in double precision — exact enough for the
    * ≤8192 block sizes Vorbis allows, and the independent formula the spec
    * test can also state. */
  private[media] def imdctDirect(x: Array[Float], n: Int): Array[Float] = {
    val n2 = n / 2
    val out = new Array[Float](n)
    val scale = StrictMath.PI / (2.0 * n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      val a = (2 * j + 1 + n2).toDouble
      var k = 0
      while (k < n2) {
        acc += x(k) * StrictMath.cos(scale * a * (2 * k + 1))
        k += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  /** O(n log n) inverse MDCT: a DCT-IV via one n/4-point complex FFT plus
    * the IMDCT's reflection extensions.
    *
    * Derivation (no table data — pure identities): with M = n/2 spectral
    * lines, y[j] = Z'[j + M/2] where Z is the M-point DCT-IV of X and Z'
    * its extension Z'[t] = −Z[2M−1−t] on [M, 2M), Z'[t] = −Z'[t−2M] beyond
    * (from cos(π−x) = −cos x and the 2π(k+1/2) period). The DCT-IV itself:
    * pack g[p] = X[2p] + i·X[M−1−2p], rotate h[p] = g[p]·e^{−iπp/M}, take
    * H = FFT_{M/2}(h), rotate s[q] = H[q]·e^{−iπ(4q+1)/(4M)}; then
    * Z[2q] = Re s[q] and Z[M−1−2q] = −Im s[q] (split the sum over even and
    * reversed-odd k; the reversed half turns into the sine term that the
    * complex product carries). */
  private[media] def imdctFft(x: Array[Float], n: Int): Array[Float] = {
    val m = n / 2
    if (m < 4 || (m & (m - 1)) != 0) return imdctDirect(x, n)
    val p = m / 2
    val re = new Array[Double](p)
    val im = new Array[Double](p)
    var k = 0
    while (k < p) {
      val ge = x(2 * k).toDouble
      val go = x(m - 1 - 2 * k).toDouble
      val a = -StrictMath.PI * k / m
      val c = StrictMath.cos(a); val s = StrictMath.sin(a)
      re(k) = ge * c - go * s
      im(k) = go * c + ge * s
      k += 1
    }
    fftInPlace(re, im)
    val z = new Array[Double](m)
    var q = 0
    while (q < p) {
      val a = -StrictMath.PI * (4 * q + 1) / (4.0 * m)
      val c = StrictMath.cos(a); val s = StrictMath.sin(a)
      val sr = re(q) * c - im(q) * s
      val si = im(q) * c + re(q) * s
      z(2 * q) = sr
      z(m - 1 - 2 * q) = -si
      q += 1
    }
    val out = new Array[Float](n)
    val h = m / 2
    var j = 0
    while (j < h) { out(j) = z(j + h).toFloat; j += 1 }           // t ∈ [M/2, M)
    while (j < h + m) { out(j) = (-z(3 * h - 1 - j)).toFloat; j += 1 } // t ∈ [M, 2M)
    while (j < n) { out(j) = (-z(j - 3 * h)).toFloat; j += 1 }    // t ∈ [2M, 2M+M/2)
    out
  }

  /** In-place iterative radix-2 complex FFT (kernel e^{−2πi·jk/N}); length
    * must be a power of two. */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang); val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = bi * cr + br * ci
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = ci * wr + cr * wi
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Vorbis window (spec §4.3.1) applied in place over the n-sample frame;
    * slope widths follow the prev/next used-block sizes. */
  private def applyWindow(w: Array[Float], n: Int, prevUsed: Int, nextUsed: Int): Unit = {
    val leftStart = n / 4 - prevUsed / 4
    val leftEnd = n / 4 + prevUsed / 4
    val rightStart = 3 * n / 4 - nextUsed / 4
    val rightEnd = 3 * n / 4 + nextUsed / 4
    var j = 0
    while (j < n) {
      val v =
        if (j < leftStart) 0.0
        else if (j < leftEnd) {
          val t = (j - leftStart + 0.5) / (prevUsed / 2.0) * (StrictMath.PI / 2.0)
          StrictMath.sin(StrictMath.PI / 2.0 * StrictMath.sin(t) * StrictMath.sin(t))
        } else if (j < rightStart) 1.0
        else if (j < rightEnd) {
          val t = (j - rightStart + 0.5) / (nextUsed / 2.0) * (StrictMath.PI / 2.0) + StrictMath.PI / 2.0
          StrictMath.sin(StrictMath.PI / 2.0 * StrictMath.sin(t) * StrictMath.sin(t))
        } else 0.0
      w(j) = (w(j) * v).toFloat
      j += 1
    }
  }

  // ---------------------------------------------------------------- headers

  private def parseHeaders(packets: Array[Array[Byte]]): Setup = {
    if (packets.length < 3) return null
    // identification header (spec §4.2.2)
    val id = new BitReader(packets(0))
    if (id.read(8) != 1 || !sigOk(packets(0))) return null
    id.read(24); id.read(24) // skip the 6 signature bytes ("vorbis")
    if (id.readLong(32) != 0L) return null // vorbis_version
    val channels = id.read(8)
    val sampleRate = id.readLong(32).toInt
    id.readLong(32); id.readLong(32); id.readLong(32) // bitrates
    val bsByte = id.read(8)
    if (id.eop || channels <= 0 || channels > MaxChannels || sampleRate <= 0) return null
    val bs0 = 1 << (bsByte & 0xf)
    val bs1 = 1 << ((bsByte >> 4) & 0xf)
    if (bs0 < 64 || bs1 < bs0 || bs1 > 8192) return null
    if (id.readBit() != 1) return null // framing
    // comment header (§4.2.3): type 3 — content ignored
    if (packets(1).isEmpty || (packets(1)(0) & 0xff) != 3 || !sigOk(packets(1))) return null
    // setup header (§4.2.4)
    val p = packets(2)
    if (p.isEmpty || (p(0) & 0xff) != 5 || !sigOk(p)) return null
    val r = new BitReader(p)
    r.read(8); r.read(24); r.read(24) // type + "vorbis"
    val nBooks = r.read(8) + 1
    if (r.eop || nBooks > MaxCodebooks) return null
    val books = new Array[Codebook](nBooks)
    var i = 0
    while (i < nBooks) {
      books(i) = parseCodebook(r)
      if (books(i) == null) return null
      i += 1
    }
    val timeCount = r.read(6) + 1
    i = 0
    while (i < timeCount) { if (r.read(16) != 0) return null; i += 1 }
    val floorCount = r.read(6) + 1
    if (r.eop || floorCount <= 0) return null
    val floors = new Array[Floor1](floorCount)
    i = 0
    while (i < floorCount) {
      val t = r.read(16)
      if (t != 1) return null // floor 0 (legacy LSP) unsupported
      floors(i) = parseFloor1(r)
      if (floors(i) == null) return null
      i += 1
    }
    val residueCount = r.read(6) + 1
    if (r.eop || residueCount <= 0) return null
    val residues = new Array[Residue](residueCount)
    i = 0
    while (i < residueCount) {
      val t = r.read(16)
      if (t < 0 || t > 2) return null
      residues(i) = parseResidue(r, t)
      if (residues(i) == null) return null
      i += 1
    }
    val mappingCount = r.read(6) + 1
    if (r.eop || mappingCount <= 0) return null
    val mappings = new Array[Mapping](mappingCount)
    i = 0
    while (i < mappingCount) {
      if (r.read(16) != 0) return null
      mappings(i) = parseMapping(r, channels, floorCount, residueCount)
      if (mappings(i) == null) return null
      i += 1
    }
    val modeCount = r.read(6) + 1
    if (r.eop || modeCount <= 0) return null
    val modes = new Array[Mode](modeCount)
    i = 0
    while (i < modeCount) {
      val blockFlag = r.readBit()
      if (r.read(16) != 0 || r.read(16) != 0) return null // window/transform type
      val mapping = r.read(8)
      if (r.eop || mapping >= mappingCount) return null
      modes(i) = new Mode(blockFlag, mapping)
      i += 1
    }
    if (r.readBit() != 1) return null // framing
    new Setup(channels, sampleRate, Array(bs0, bs1), books, floors, residues, mappings, modes)
  }

  private def sigOk(p: Array[Byte]): Boolean =
    p.length >= 7 && p(1) == 'v' && p(2) == 'o' && p(3) == 'r' &&
      p(4) == 'b' && p(5) == 'i' && p(6) == 's'

  // -------------------------------------------------------------- main loop

  private def decodeImpl(b: Array[Byte], maxSamples: Int): Option[Pcm] = {
    if (b == null || b.length < 58) return None
    val (packets, granule) = oggPackets(b) match {
      case Some(x) => x
      case None => return None
    }
    val setup = parseHeaders(packets)
    if (setup == null) return None
    val ch = setup.channels
    val modeBits = ilog(setup.modes.length - 1) // 0 bits when only one mode
    val pcm = new java.util.ArrayList[Array[Float]]() // emitted chunks, interleaved
    var emitted = 0L
    var floorYSum = 0L
    var nPackets = 0
    var prevWindowed: Array[Array[Float]] = null // per channel
    var prevN = 0
    var pi = 3
    // the cap bounds TOTAL interleaved values (frames × channels): a hostile
    // 16-channel stream must not grow the buffer 16× past the limit
    while (pi < packets.length && emitted * ch < maxSamples) {
      val r = new BitReader(packets(pi))
      if (r.readBit() == 0) { // audio packet (type bit 0)
        val modeIdx = if (modeBits == 0) 0 else r.read(modeBits)
        if (modeIdx >= 0 && modeIdx < setup.modes.length && !r.eop) {
          val mode = setup.modes(modeIdx)
          val n = setup.blocksizes(mode.blockFlag)
          val n2 = n / 2
          var prevUsed = n
          var nextUsed = n
          if (mode.blockFlag == 1) {
            val pf = r.readBit(); val nf = r.readBit()
            if (pf == 0) prevUsed = setup.blocksizes(0)
            if (nf == 0) nextUsed = setup.blocksizes(0)
          }
          val mapping = setup.mappings(mode.mapping)
          // floors
          val curves = new Array[Array[Float]](ch)
          val noResidue = new Array[Boolean](ch)
          var c = 0
          var frameOk = !r.eop
          while (c < ch && frameOk) {
            val fIdx = mapping.submapFloor(if (mapping.submaps > 1) mapping.mux(c) else 0)
            val (curve, ys) = floor1Decode(r, setup.floors(fIdx), setup.codebooks, n2)
            curves(c) = curve
            noResidue(c) = curve == null
            floorYSum += ys
            if (r.eop) frameOk = false
            c += 1
          }
          // coupling forces both halves of a pair to decode
          var s = 0
          while (s < mapping.couplingMag.length) {
            if (!noResidue(mapping.couplingMag(s)) || !noResidue(mapping.couplingAng(s))) {
              noResidue(mapping.couplingMag(s)) = false
              noResidue(mapping.couplingAng(s)) = false
            }
            s += 1
          }
          // residues per submap
          val residueVec = Array.ofDim[Float](ch, n2)
          if (frameOk) {
            s = 0
            while (s < mapping.submaps) {
              val chIdx = (0 until ch).filter(j =>
                (if (mapping.submaps > 1) mapping.mux(j) else 0) == s).toArray
              val res = setup.residues(mapping.submapResidue(s))
              if (res.typ == 2) {
                val any = chIdx.exists(j => !noResidue(j))
                val inter = new Array[Float](chIdx.length * n2)
                if (any) residueDecode(r, res, setup.codebooks,
                  Array(inter), Array(false))
                var k = 0
                while (k < inter.length) {
                  residueVec(chIdx(k % chIdx.length))(k / chIdx.length) = inter(k)
                  k += 1
                }
              } else {
                val vecs = chIdx.map(j => residueVec(j))
                val doNot = chIdx.map(j => noResidue(j))
                residueDecode(r, res, setup.codebooks, vecs, doNot)
              }
              s += 1
            }
          }
          // inverse coupling (§4.3.5)
          s = mapping.couplingMag.length - 1
          while (s >= 0) {
            val m = residueVec(mapping.couplingMag(s))
            val a = residueVec(mapping.couplingAng(s))
            var k = 0
            while (k < n2) {
              val mv = m(k); val av = a(k)
              if (mv > 0) {
                if (av > 0) { m(k) = mv; a(k) = mv - av }
                else { a(k) = mv; m(k) = mv + av }
              } else {
                if (av > 0) { m(k) = mv; a(k) = mv + av }
                else { a(k) = mv; m(k) = mv - av }
              }
              k += 1
            }
            s -= 1
          }
          // dot product + iMDCT + window
          val windowed = new Array[Array[Float]](ch)
          c = 0
          while (c < ch) {
            val spec = new Array[Float](n2)
            if (curves(c) != null) {
              var k = 0
              while (k < n2) { spec(k) = curves(c)(k) * residueVec(c)(k); k += 1 }
            }
            val t = imdct(spec, n)
            applyWindow(t, n, prevUsed, nextUsed)
            windowed(c) = t
            c += 1
          }
          // overlap-add emission: from previous center to current center
          if (prevWindowed != null) {
            val emitLen = prevN / 4 + n / 4
            val chunk = new Array[Float](emitLen * ch)
            var i2 = 0
            while (i2 < emitLen) {
              val j = i2 + n / 4 - prevN / 4
              c = 0
              while (c < ch) {
                val pv = if (prevN / 2 + i2 < prevN) prevWindowed(c)(prevN / 2 + i2) else 0f
                val cv = if (j >= 0 && j < n) windowed(c)(j) else 0f
                chunk(i2 * ch + c) = pv + cv
                c += 1
              }
              i2 += 1
            }
            pcm.add(chunk)
            emitted += emitLen
          }
          prevWindowed = windowed
          prevN = n
          nPackets += 1
        }
      }
      pi += 1
    }
    // end-granule truncation (spec §A.2: granule of the last page is the
    // absolute sample position — a shorter final frame truncates the tail)
    val totalFrames =
      if (granule >= 0 && granule < emitted) granule
      else emitted
    val data = new Array[Byte]((totalFrames * ch).toInt)
    var sumAbsMicro = 0L
    var peakMicro = 0L
    var written = 0L
    var ci = 0
    val it = pcm.iterator()
    while (it.hasNext && written < totalFrames * ch) {
      val chunk = it.next()
      var k = 0
      while (k < chunk.length && written < totalFrames * ch) {
        val x = chunk(k)
        val ax = math.abs(x.toDouble)
        val micro = math.floor(ax * 1e6).toLong
        sumAbsMicro += micro
        if (micro > peakMicro) peakMicro = micro
        val clamped = math.max(-1.0, math.min(1.0, x.toDouble))
        val u8 = math.max(0, math.min(255, StrictMath.round(clamped * 127.0).toInt + 128))
        data(written.toInt) = u8.toByte
        written += 1
        k += 1
      }
      ci += 1
    }
    Some(Pcm(setup.sampleRate, ch, totalFrames, nPackets, floorYSum,
      sumAbsMicro, peakMicro, data))
  }
}
