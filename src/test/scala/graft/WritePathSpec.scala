package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._

class WritePathSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("ignore filter reproduces the reference flow-test sequence") {
    // mirrors reference tests/flow/test_ignore.py::test_ignore_create
    // (IGNORE 5 5, DUPLICATE_POLICY LAST)
    val in = Seq(
      ("k", 1000L, 1.0), ("k", 1001L, 2.0), ("k", 1006L, 3.0),
      ("k", 1007L, 8.0), ("k", 1008L, 10.0), ("k", 1009L, 15.0001))
      .toDF("series", "ts", "value")
    val got = WritePath.ignoreFilter(in, 5L, 5.0)
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1000L, 1.0), (1006L, 3.0), (1008L, 10.0), (1009L, 15.0001)))
  }

  test("duplicate NaN fold follows the reference (valid wins; NaN-first poisons)") {
    // reference handleDuplicateSample generic_chunk.c:62-96: under
    // FIRST/LAST the valid sample wins regardless of policy; under
    // MIN/MAX/SUM a NaN/valid mix REJECTS the new write, so a NaN-first
    // timestamp stays NaN and NaN writes never poison a valid one
    val nan = Double.NaN
    val in = Seq(
      ("a", 10L, nan, 1L), ("a", 10L, 5.0, 2L), ("a", 10L, 3.0, 3L), // NaN first
      ("b", 10L, 5.0, 1L), ("b", 10L, nan, 2L), ("b", 10L, 2.0, 3L), // valid first
      ("c", 10L, nan, 1L), ("c", 10L, nan, 2L))                      // all NaN
      .toDF("series", "ts", "value", "seq")
    def m(p: String) = WritePath.applyDupPolicy(in, p)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("FIRST")("a") == 5.0 && m("FIRST")("b") == 5.0 && m("FIRST")("c").isNaN)
    assert(m("LAST")("a") == 3.0 && m("LAST")("b") == 2.0 && m("LAST")("c").isNaN)
    assert(m("MIN")("a").isNaN && m("MIN")("b") == 2.0 && m("MIN")("c").isNaN)
    assert(m("MAX")("a").isNaN && m("MAX")("b") == 5.0 && m("MAX")("c").isNaN)
    assert(m("SUM")("a").isNaN && m("SUM")("b") == 7.0 && m("SUM")("c").isNaN)
  }

  test("randomized duplicate fold equals the sequential reference model") {
    // the grouped closed form (first-valid / last-valid / NaN-first
    // poisons the combining policies) must equal a literal sequential
    // fold of handleDuplicateSample (generic_chunk.c:62-96) in arrival
    // order, for any NaN mix
    def refFold(policy: String, vs: Seq[Double]): Double =
      vs.reduceLeft { (stored, v) =>
        val mixed = stored.isNaN != v.isNaN
        val hasNaN = stored.isNaN || v.isNaN
        policy match {
          case "MIN" | "MAX" | "SUM" if mixed => stored // CR_ERR: write rejected
          case _ if hasNaN => if (v.isNaN) stored else v // valid sample wins
          case "FIRST" => stored
          case "LAST"  => v
          case "MIN"   => math.min(stored, v)
          case "MAX"   => math.max(stored, v)
          case "SUM"   => stored + v
        }
      }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 300).map { i =>
        val v = if (rnd.nextInt(4) == 0) Double.NaN else rnd.nextInt(50).toDouble
        (s"s${rnd.nextInt(4)}", rnd.nextInt(6).toLong, v, i.toLong)
      }
      val df = rows.toDF("series", "ts", "value", "seq")
      for (p <- Seq("FIRST", "LAST", "MIN", "MAX", "SUM")) {
        val expect = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
          k -> refFold(p, g.sortBy(_._4).map(_._3))
        }
        val got = WritePath.applyDupPolicy(df, p)
          .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
        assert(got.keySet == expect.keySet)
        got.foreach { case (k, v) =>
          val e = expect(k)
          assert((v.isNaN && e.isNaN) || math.abs(v - e) < 1e-9,
            s"seed=$seed policy=$p cell=$k got $v expected $e")
        }
      }
    }
  }

  test("duplicate policies resolve per arrival order and value") {
    val in = Seq(
      ("k", 10L, 5.0, 1L), ("k", 10L, 3.0, 2L), ("k", 10L, 4.0, 3L),
      ("k", 20L, 9.0, 4L))
      .toDF("series", "ts", "value", "seq")
    def vals(p: String) = WritePath.applyDupPolicy(in, p)
      .orderBy("ts").collect().map(_.getDouble(2)).toSeq
    assert(vals("FIRST") == Seq(5.0, 9.0))
    assert(vals("LAST") == Seq(4.0, 9.0))
    assert(vals("MIN") == Seq(3.0, 9.0))
    assert(vals("MAX") == Seq(5.0, 9.0))
    assert(vals("SUM") == Seq(12.0, 9.0))
    intercept[IllegalStateException](WritePath.applyDupPolicy(in, "BLOCK").collect())
  }

  test("retention clamp keeps only the trailing window per series") {
    val in = Seq(("a", 0L, 1.0), ("a", 50L, 2.0), ("a", 100L, 3.0),
      ("b", 0L, 4.0)).toDF("series", "ts", "value")
    val got = WritePath.retentionClamp(in, 40L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a keeps ts >= 100-40=60 -> only 100; b keeps ts >= 0-40 -> 0
    assert(got == Set(("a", 100L), ("b", 0L)))
  }

  test("counter replay accumulates deltas, merging same-ts deltas first") {
    val in = Seq(("k", 1L, 5.0), ("k", 1L, 2.0), ("k", 3L, -4.0))
      .toDF("series", "ts", "value")
    val got = WritePath.counterReplay(in)
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 7.0), (3L, 3.0)))
  }

  test("counter replay rejects deltas older than the per-series tail") {
    // reference module.c:1515-1518: a counter write at ts < lastTimestamp
    // errors — with an arrival-order column the replay enforces it
    val ooo = Seq(("k", 10L, 1.0, 1L), ("k", 5L, 2.0, 2L))
      .toDF("series", "ts", "value", "seq")
    val e = intercept[IllegalArgumentException](
      WritePath.counterReplay(ooo, seqCol = Some("seq")))
    assert(e.getMessage.contains("timestamp must be equal to or higher"))
    // in-order (equal ts allowed: applies to the same last value)
    val ok = Seq(("k", 5L, 1.0, 1L), ("k", 5L, 2.0, 2L), ("k", 10L, 4.0, 3L))
      .toDF("series", "ts", "value", "seq")
    val got = WritePath.counterReplay(ok, seqCol = Some("seq"))
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((5L, 3.0), (10L, 7.0)))
  }

  test("madd status reports per-item outcomes (reference sequential model)") {
    val nan = Double.NaN
    // BLOCK: first store wins, later duplicates error; retention gate
    // rejects items older than the running tail minus retention
    val in = Seq(
      ("k", 100L, 1.0, 1L), ("k", 100L, 2.0, 2L),   // dup under BLOCK
      ("r", 1000L, 1.0, 3L), ("r", 10L, 2.0, 4L),   // 990 > 500 -> retention err
      ("r", 700L, 3.0, 5L))                          // 300 <= 500 -> ok (upsert-insert)
      .toDF("series", "ts", "value", "seq")
    val got = WritePath.maddStatus(in, "BLOCK", retentionMs = 500L)
      .collect().map(r => (r.getLong(3), (r.getBoolean(4), Option(r.getString(5))))).toMap
    assert(got(1L) == (true, None))
    assert(got(2L)._1 == false && got(2L)._2.get.contains("BLOCK mode"))
    assert(got(3L) == (true, None))
    assert(got(4L)._1 == false && got(4L)._2.get.contains("older than retention"))
    assert(got(5L) == (true, None))
    // MIN/MAX/SUM: NaN/valid mix errors, like-with-like folds accept;
    // FIRST/LAST always accept duplicates
    val mix = Seq(
      ("a", 10L, nan, 1L), ("a", 10L, 5.0, 2L), ("a", 10L, nan, 3L),
      ("b", 10L, 5.0, 1L), ("b", 10L, 2.0, 2L))
      .toDF("series", "ts", "value", "seq")
    val sum = WritePath.maddStatus(mix, "SUM")
      .collect().map(r => (r.getString(0), r.getLong(3)) -> r.getBoolean(4)).toMap
    assert(sum(("a", 1L)) && !sum(("a", 2L)) && sum(("a", 3L)))  // NaN-first: valid write rejected, NaN folds
    assert(sum(("b", 1L)) && sum(("b", 2L)))
    val last = WritePath.maddStatus(mix, "LAST")
      .collect().map(r => (r.getString(0), r.getLong(3)) -> r.getBoolean(4)).toMap
    assert(last.values.forall(identity))
  }

  test("randomized madd status equals the sequential reference model") {
    // literal fold of internalAdd (module.c:1000-1055): running
    // lastTimestamp, retention gate, then handleDuplicateSample
    // (generic_chunk.c:62-96) against the stored sample at ts
    def refModel(policy: String, retention: Long,
        rows: Seq[(Long, Double, Long)]): Map[Long, Boolean] = {
      var lastTs = Long.MinValue
      val stored = scala.collection.mutable.Map.empty[Long, Double]
      rows.sortBy(_._3).map { case (ts, v, seq) =>
        val ok =
          if (retention > 0 && lastTs != Long.MinValue && ts < lastTs &&
              lastTs - ts > retention) false
          else stored.get(ts) match {
            case None =>
              stored(ts) = v; if (ts > lastTs || lastTs == Long.MinValue) lastTs = ts
              true
            case Some(old) =>
              val mixed = old.isNaN != v.isNaN
              val hasNaN = old.isNaN || v.isNaN
              policy match {
                case "BLOCK" => false
                case "MIN" | "MAX" | "SUM" if mixed => false
                case _ if hasNaN => if (!v.isNaN) stored(ts) = v; true
                case "FIRST" => true
                case "LAST" => stored(ts) = v; true
                case "MIN" => stored(ts) = math.min(old, v); true
                case "MAX" => stored(ts) = math.max(old, v); true
                case "SUM" => stored(ts) = old + v; true
              }
          }
        seq -> ok
      }.toMap
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val policy = Seq("BLOCK", "FIRST", "LAST", "MIN", "MAX", "SUM")(seed % 6)
      val retention = Seq(0L, 300L)(rnd.nextInt(2))
      val rows = (0 until 2).flatMap { s =>
        (0 until 60).map { i =>
          val ts = rnd.nextInt(12) * 100L // collisions + OOO guaranteed
          val v = if (rnd.nextInt(6) == 0) Double.NaN else rnd.nextInt(50).toDouble
          (s"s$s", ts, v, (s * 100 + i).toLong)
        }
      }
      val got = WritePath.maddStatus(
          rows.toDF("series", "ts", "value", "seq"), policy, retention)
        .collect().map(r => (r.getString(0), r.getLong(3)) -> r.getBoolean(4)).toMap
      for (s <- Seq("s0", "s1")) {
        val expect = refModel(policy, retention,
          rows.filter(_._1 == s).map(r => (r._2, r._3, r._4)))
        expect.foreach { case (seq, ok) =>
          assert(got((s, seq)) == ok,
            s"seed=$seed policy=$policy retention=$retention series=$s seq=$seq: " +
              s"got ${got((s, seq))} expected $ok")
        }
      }
    }
  }

  test("compaction materialize flushes all but the in-flight bucket; latest surfaces it") {
    val in = Seq(("k", 0L, 1.0), ("k", 50L, 3.0), ("k", 100L, 10.0), ("k", 250L, 20.0))
      .toDF("series", "ts", "value")
    val rule = Compaction.Rule("avg", 100L)
    val flushed = Compaction.materialize(in, rule)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(flushed.toSet == Set(("k_AVG_100", 0L, 2.0), ("k_AVG_100", 100L, 10.0)))
    val lat = Compaction.latest(in, rule).head()
    assert(lat.getString(0) == "k_AVG_100" && lat.getLong(1) == 200L && lat.getDouble(2) == 20.0)
  }

  test("streaming downsample equals batch materialization incl. latest") {
    val batch = Compaction.materialize(
      TSModel.samples(spark, sf), Compaction.Rule("sum", 86400000L), includeLatest = true)
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    val stream = Compaction.streamingDownsampleOnce(spark, sf,
      Compaction.Rule("sum", 86400000L), "spec_stream_sum")
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .toSet
    assert(stream == batch && stream.nonEmpty)
  }
}
