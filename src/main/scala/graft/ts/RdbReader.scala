package graft.ts

/**
 * Independent reader for the subset of the RDB wire format the
 * reference's committed test fixtures use — RDB v9 framing plus the
 * module-2 payload of the time-series module at encoding versions 0
 * (legacy flat samples, `1.0.1.rdb`) and 2 (TS_SIZE_RDB_VER: per-series
 * header + compressed-chunk list + serialized compaction rules with
 * their RUNNING aggregation contexts, `1.4.9_with_avg_ctx.rdb`).
 *
 * The field order is the reference's own load path (series_rdb_load,
 * reference: src/rdb.c:23-155; chunk fields
 * Compressed_Serialize/LoadFromRDB, src/compressed_chunk.c:488-545;
 * avg context AvgWriteContext/AvgReadContext, src/compaction.c:283-300;
 * encver gates src/rdb.h:17-29). This is a purpose-built decoder for
 * fixture EXTRACTION — it reads exactly what the bundled fixtures
 * contain and fails loudly on anything else (notably Gorilla chunk
 * interiors: the codec is deliberately not ported, so only chunks
 * whose ≤2 samples are fully recoverable from the raw header fields
 * baseTimestamp/baseValue/prevTimestamp/prevValue are decoded).
 */
private[ts] object RdbReader {

  /** A serialized compaction rule WITH its running context — the
    * reference's mid-bucket state (rule_rdb fields src/rdb.c:86-118).
    * `ctx` for avg is (runningSum, count) (src/compaction.c:283-300). */
  final case class RuleState(dest: String, bucketMs: Long, alignMs: Long,
      aggType: Int, startBucket: Long, ctx: Array[Double]) {
    /** Reference enum name, lowercased (consts.h:53-73 order). */
    def agg: String = AggNames(aggType)
  }

  /** Reference TS_AGG_TYPES_T enum order (consts.h:53-73). */
  val AggNames: Vector[String] = Vector("none", "min", "max", "sum", "avg",
    "count", "first", "last", "range", "std.p", "std.s", "var.p", "var.s",
    "twa", "countnan", "countall")

  final case class SeriesState(key: String, retention: Long,
      labels: Seq[(String, String)], srcKey: Option[String], lastTs: Long,
      lastValue: Double, totalSamples: Long, rules: Seq[RuleState],
      samples: Array[(Long, Double)])

  /** Decode every time-series module value in an RDB image, file order. */
  def parseFile(data: Array[Byte]): Seq[SeriesState] = {
    val r = new RdbReader(data)
    require(new String(data, 0, 5) == "REDIS", "not an RDB file")
    r.skip(9) // "REDIS0009"
    val out = Seq.newBuilder[SeriesState]
    var done = false
    while (!done) {
      r.u8() match {
        case 0xFA => r.readString(); r.readString() // aux field
        case 0xFE => r.readLen()                    // selectdb
        case 0xFB => r.readLen(); r.readLen()       // resizedb
        case 0xFC => r.skip(8)                      // expire ms
        case 0xFD => r.skip(4)                      // expire s
        case 0xFF => done = true
        case 0x07 => out += series(r)               // RDB_TYPE_MODULE_2
        case t => throw new IllegalStateException(
          f"unexpected RDB type 0x$t%02x at ${r.pos}")
      }
    }
    out.result()
  }

  /** One module-2 series payload (series_rdb_load, src/rdb.c:23-155). */
  private def series(r: RdbReader): SeriesState = {
    r.readString() // redis key (the payload repeats it)
    val encver = (r.readLen()._1 & 0x3ff).toInt // module id low 10 bits
    require(encver == 0 || encver == 2,
      s"only encver 0 and 2 fixtures are bundled, got $encver")
    val key = r.modString()
    val retention = r.modUint()
    r.modUint() // chunk size
    if (encver >= 1) r.modUint() // options (TS_UNCOMPRESSED_VER)
    // TS_SIZE_RDB_VER header block
    val lastTs = if (encver >= 2) r.modUint() else 0L
    val lastValue = if (encver >= 2) r.modDouble() else 0.0
    val totalSamples = if (encver >= 2) r.modUint() else 0L
    // duplicatePolicy only at encver >= 3 (TS_IS_RESSETED_DUP_POLICY)
    val srcKey = if (encver >= 2 && r.modUint() != 0) Some(r.modString()) else None
    // ignoreMaxTimeDiff/ValDiff only at encver >= 8 (TS_CREATE_IGNORE)
    val labels = (0L until r.modUint()).map(_ => (r.modString(), r.modString()))
    val rules = (0L until r.modUint()).map { _ =>
      val dest = r.modString()
      val bucketMs = r.modUint()
      val alignMs = if (encver >= 6) r.modUint() else 0L // TS_ALIGNMENT_TS
      val aggType = r.modUint().toInt
      val startBucket = r.modUint()
      if (encver >= 9) r.modUint() // validSamplesInBucket (TS_NAN_SUPPORT)
      // running context, per AggregationClass.readContext: only the avg
      // layout (val, cnt doubles; overflow flag first at encver >= 4)
      // appears in the bundled fixtures — fail loudly on the rest
      require(aggType == 4,
        s"only AVG rule contexts are decoded (fixture scope), got aggType $aggType")
      val ctx = Array(r.modDouble(), r.modDouble())
      if (encver >= 4) r.modUint() // isOverflow (TS_OVERFLOW_RDB_VER)
      RuleState(dest, bucketMs, alignMs, aggType, startBucket, ctx)
    }
    val samples: Array[(Long, Double)] =
      if (encver < 2) Array.fill(r.modUint().toInt)((r.modUint(), r.modDouble()))
      else (0L until r.modUint()).flatMap { _ =>
        // compressed-chunk raw header (src/compressed_chunk.c:494-504):
        // size, count, idx, baseValue, baseTimestamp, prevTimestamp,
        // prevTimestampDelta, prevValue, prevLeading, prevTrailing, data
        r.modUint() // size
        val count = r.modUint()
        r.modUint() // idx
        val baseV = java.lang.Double.longBitsToDouble(r.modUint())
        val baseT = r.modUint()
        val prevT = r.modUint()
        r.modUint() // prevTimestampDelta
        val prevV = java.lang.Double.longBitsToDouble(r.modUint())
        r.modUint(); r.modUint() // prevLeading, prevTrailing
        r.skipModString() // Gorilla bitstream (LZF-packed) — header-only decode
        require(count <= 2, s"chunk holds $count samples; interior samples " +
          "need the Gorilla codec, which is deliberately not ported")
        if (count == 0) Nil
        else if (count == 1) Seq((baseT, baseV))
        else Seq((baseT, baseV), (prevT, prevV))
      }.toArray
    require(r.readLen()._1 == 0, s"expected module EOF at ${r.pos}")
    SeriesState(key, retention, labels, srcKey, lastTs, lastValue,
      totalSamples, rules, samples)
  }
}

/** Byte-walk primitives for the RDB wire encodings (redis length
  * encoding, int-packed strings, LZF-framed strings, module opcodes). */
private[ts] final class RdbReader(data: Array[Byte]) {
  var pos = 0
  def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
  def skip(n: Int): Unit = pos += n
  private def beLong(n: Int): Long = {
    var v = 0L; for (_ <- 0 until n) v = (v << 8) | u8(); v
  }
  def leLong(n: Int): Long = {
    var v = 0L; for (i <- 0 until n) v |= (data(pos + i) & 0xffL) << (8 * i)
    pos += n; v
  }

  /** RDB length encoding (2-bit tag): 00=6-bit, 01=14-bit,
    * 0x80/0x81=32/64-bit BE, 11=encoded string. */
  def readLen(): (Long, Boolean) = {
    val b = u8()
    (b >> 6) match {
      case 0 => (b & 0x3f, false)
      case 1 => (((b & 0x3f).toLong << 8) | u8(), false)
      case 2 =>
        if (b == 0x80) (beLong(4), false)
        else if (b == 0x81) (beLong(8), false)
        else throw new IllegalStateException(f"bad length byte 0x$b%02x at $pos")
      case _ => (b & 0x3f, true)
    }
  }

  def readString(): String = {
    val (l, enc) = readLen()
    if (!enc) {
      val s = new String(data, pos, l.toInt, java.nio.charset.StandardCharsets.UTF_8)
      pos += l.toInt; s
    } else l match { // int-encoded strings (INT8/16/32)
      case 0 => leLong(1).toByte.toString
      case 1 => leLong(2).toShort.toString
      case 2 => leLong(4).toInt.toString
      case e => throw new IllegalStateException(s"unsupported string encoding $e at $pos")
    }
  }

  /** Advance past a string of ANY encoding, including LZF-compressed
    * (0xc3: clen, ulen, then clen packed bytes) — used for chunk data
    * blobs whose content is not decoded. */
  def skipModString(): Unit = {
    val op = readLen()._1
    require(op == 5, s"expected STRING opcode, got $op at $pos")
    val (l, enc) = readLen()
    if (!enc) skip(l.toInt)
    else l match {
      case 0 => skip(1)
      case 1 => skip(2)
      case 2 => skip(4)
      case 3 => val clen = readLen()._1; readLen(); skip(clen.toInt)
      case e => throw new IllegalStateException(s"unsupported string encoding $e at $pos")
    }
  }

  // module-2 payload values are opcode-framed (EOF/UINT/DOUBLE/STRING),
  // both opcode and UINT value in length encoding; DOUBLE is 8-byte LE
  def modUint(): Long = {
    val op = readLen()._1
    require(op == 2, s"expected UINT opcode, got $op at $pos"); readLen()._1
  }
  def modString(): String = {
    val op = readLen()._1
    require(op == 5, s"expected STRING opcode, got $op at $pos"); readString()
  }
  def modDouble(): Double = {
    val op = readLen()._1
    require(op == 4, s"expected DOUBLE opcode, got $op at $pos")
    java.lang.Double.longBitsToDouble(leLong(8))
  }
}
