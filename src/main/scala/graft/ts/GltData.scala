package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Second real-measurement golden fixture (VERDICT r05 missing #2): the
 * reference's RDB-compatibility suite loads the Berkeley Earth
 * GlobalLandTemperaturesByMajorCity dataset — 100 major cities × 2
 * metrics (AverageTemperature / AverageTemperatureUncertainty), each a
 * labeled series `metric:city` with REAL labels (city, country,
 * latitude, longitude; `metric` only on the temperature series) —
 * monthly samples from 1970 on (negative pre-epoch timestamps are
 * skipped by the loader, tests/flow/create_test_rdb_file.py:37-76).
 *
 * The raw CSV is not in the reference tree; the dataset ships INSIDE
 * its committed RDB fixtures (the tests/flow/rdbs directory,
 * tests/flow/README.md:1-15). `1.0.1.rdb` is bundled here verbatim
 * (a public test DATASET, the lemire precedent) and decoded by
 * [[parse]] — a ~100-line reader for RDB v9 + the module's encver-0
 * payload, whose field order is the reference's own legacy load path
 * (series_rdb_load, src/rdb.c:22-127: keyName, retention, chunkSize,
 * labels, rules, samplesCount, then flat (timestamp, double) pairs —
 * encver 0 predates Gorilla chunk serialization).
 *
 * Like the lemire fixture, the decoded samples/labels are materialized
 * ONCE to deterministic CSV paths that BOTH engines read — Spark via
 * [[samples]]/[[labels]], DuckDB via `read_csv` in [[samplesCte]] /
 * [[labelsWideCte]] — so every ts_glt_* differential runs on the
 * identical real measurements with real label structure (49 countries
 * for GROUPBY; `metric` absent on half the series for
 * SELECTED_LABELS).
 */
object GltData {

  final case class Series(key: String, labels: Seq[(String, String)],
      samples: Array[(Long, Double)])

  /** Decode the bundled RDB: all 200 series in file order. */
  lazy val parse: Seq[Series] = {
    val in = getClass.getResourceAsStream("/fixtures/glt_1.0.1.rdb")
    require(in != null, "bundled fixture /fixtures/glt_1.0.1.rdb missing from classpath")
    val data = in.readAllBytes(); in.close()
    var pos = 0
    def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
    def skip(n: Int): Unit = pos += n
    def beLong(n: Int): Long = {
      var v = 0L; for (_ <- 0 until n) v = (v << 8) | u8(); v
    }
    // RDB length encoding (rdb.c of redis itself; 2-bit tag):
    // 00=6-bit, 01=14-bit, 0x80/0x81=32/64-bit BE, 11=encoded string
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
    def leLong(n: Int): Long = {
      var v = 0L; for (i <- 0 until n) v |= (data(pos + i) & 0xffL) << (8 * i)
      pos += n; v
    }
    def readString(): String = {
      val (l, enc) = readLen()
      if (!enc) {
        val s = new String(data, pos, l.toInt, java.nio.charset.StandardCharsets.UTF_8)
        pos += l.toInt; s
      } else l match { // int-encoded strings (INT8/16/32); LZF never
        case 0 => leLong(1).toByte.toString // appears in these fixtures
        case 1 => leLong(2).toShort.toString
        case 2 => leLong(4).toInt.toString
        case e => throw new IllegalStateException(s"unsupported string encoding $e")
      }
    }
    require(new String(data, 0, 5) == "REDIS", "not an RDB file")
    skip(9) // "REDIS0009"
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
    val out = Seq.newBuilder[Series]
    var done = false
    while (!done) {
      u8() match {
        case 0xFA => readString(); readString() // aux field
        case 0xFE => readLen()                  // selectdb
        case 0xFB => readLen(); readLen()       // resizedb
        case 0xFC => skip(8)                    // expire ms
        case 0xFD => skip(4)                    // expire s
        case 0xFF => done = true
        case 0x07 => // RDB_TYPE_MODULE_2
          readString() // redis key (the payload repeats it)
          val encver = readLen()._1 & 0x3ff
          require(encver == 0, s"expected encver 0, got $encver")
          val key = modString()
          modUint(); modUint() // retention, chunk size
          val labels = (0L until modUint()).map(_ => (modString(), modString()))
          require(modUint() == 0, "GLT fixture has no compaction rules")
          val samples = Array.fill(modUint().toInt)((modUint(), modDouble()))
          require(readLen()._1 == 0, s"expected module EOF at $pos")
          out += Series(key, labels, samples)
        case t => throw new IllegalStateException(f"unexpected RDB type 0x$t%02x at $pos")
      }
    }
    out.result()
  }

  /** Extract-once CSV twins of the decoded fixture (series,ts,value and
    * series,lkey,lvalue) at stable absolute paths both engines read —
    * the lemire write-then-atomic-move contract, content-compared so
    * concurrent JVMs and the driver's later DuckDB run always see the
    * identical bytes. Fields are verified CSV-clean at build time. */
  lazy val (samplesPath: String, labelsPath: String) = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_fixtures")
    java.nio.file.Files.createDirectories(dir)
    def emit(name: String, content: String): String = {
      val target = dir.resolve(name)
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (!java.nio.file.Files.exists(target) ||
          !java.util.Arrays.equals(java.nio.file.Files.readAllBytes(target), bytes)) {
        val tmp = java.nio.file.Files.createTempFile(dir, name, ".tmp")
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      target.toAbsolutePath.toString
    }
    def clean(s: String): String = {
      require(!s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'),
        s"CSV-hostile field in GLT fixture: $s"); s
    }
    val sb = new StringBuilder
    for (s <- parse; (ts, v) <- s.samples)
      sb ++= clean(s.key) += ',' ++= ts.toString += ',' ++=
        java.lang.Double.toString(v) += '\n' // shortest round-trip form:
        // both engines parse it back to the identical double
    val lb = new StringBuilder
    for (s <- parse; (k, v) <- s.labels)
      lb ++= clean(s.key) += ',' ++= clean(k) += ',' ++= clean(v) += '\n'
    (emit("glt_samples.csv", sb.result()), emit("glt_labels.csv", lb.result()))
  }

  /** The decoded samples as the engine's long-format frame. */
  def samples(spark: SparkSession): DataFrame =
    spark.read
      .schema("series STRING, ts LONG, value DOUBLE")
      .csv(samplesPath)

  /** Real label maps per series (metric/city/country/latitude/longitude;
    * `metric` genuinely absent on the uncertainty series). */
  def labels(spark: SparkSession): DataFrame =
    spark.read.schema("series STRING, lkey STRING, lvalue STRING")
      .csv(labelsPath)
      .groupBy(col("series"))
      .agg(map_from_entries(collect_list(struct(col("lkey"), col("lvalue"))))
        .as("labels"))

  lazy val samplesCte: String =
    s"""WITH samples AS (
       |  SELECT series, ts, value FROM read_csv('$samplesPath', header=false,
       |    columns={'series':'VARCHAR','ts':'BIGINT','value':'DOUBLE'})
       |)""".stripMargin

  /** Wide per-series label relation (no leading WITH): one row per
    * series, NULL for absent labels — the shape the oracle joins. */
  lazy val labelsWideCte: String =
    s"""glt_labels AS (
       |  SELECT series,
       |         max(CASE WHEN lkey = 'metric' THEN lvalue END) AS metric,
       |         max(CASE WHEN lkey = 'city' THEN lvalue END) AS city,
       |         max(CASE WHEN lkey = 'country' THEN lvalue END) AS country
       |  FROM read_csv('$labelsPath', header=false,
       |    columns={'series':'VARCHAR','lkey':'VARCHAR','lvalue':'VARCHAR'})
       |  GROUP BY series
       |)""".stripMargin
}
