package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's rule-bearing RDB fixture (VERDICT r06 #5):
 * `1.4.9_with_avg_ctx.rdb` (tests/flow/rdbs/, bundled verbatim —
 * 410-byte public test artifact, md5 a0e0977beba7a6df105d52d7a94eb00b)
 * is the one reference-PRODUCED image that serializes a compaction rule
 * mid-bucket: series `ts1` holds samples (100, 3.0) and (120, 5.0), an
 * AVG rule onto `ts2` with bucketDuration 1000, and the rule's RUNNING
 * context — runningSum 8.0, count 2.0 for the still-open bucket 0 —
 * while `ts2` itself has zero flushed samples (the reference's own
 * assertions, tests/flow/test_rdbs.py:75-84).
 *
 * That gives LATEST/in-flight semantics a golden whose EXPECTED values
 * come from the reference's serialized state rather than our batch
 * oracle: the engine side recomputes the in-flight bucket from the raw
 * decoded samples through [[Compaction.latest]]/[[Compaction.materialize]],
 * the DuckDB oracle side finalizes the decoded CONTEXT
 * (`ctx_val / ctx_cnt` at `start_bucket`) — two independent routes that
 * must meet, including after replaying the reference test's follow-up
 * `TS.ADD ts1 1500 100` which closes bucket 0 and flushes avg = 4.0 at
 * ts 0 into ts2 (test_rdbs.py:82-84).
 *
 * Decoded by [[RdbReader]] (encver 2: per-series header + raw
 * compressed-chunk header fields + rule contexts, reference:
 * src/rdb.c:23-155). Like the lemire/GLT fixtures, samples and rule
 * state are materialized once to deterministic CSVs both engines read.
 */
object RdbState {

  lazy val series: Seq[RdbReader.SeriesState] = {
    val in = getClass.getResourceAsStream("/fixtures/rdb_1.4.9_avg_ctx.rdb")
    require(in != null, "bundled fixture /fixtures/rdb_1.4.9_avg_ctx.rdb missing")
    val data = in.readAllBytes(); in.close()
    RdbReader.parseFile(data)
  }

  /** Every serialized rule, with its source series attached. */
  lazy val rules: Seq[(String, RdbReader.RuleState)] =
    for (s <- series; r <- s.rules) yield (s.key, r)

  /** The reference flow test's follow-up write (`TS.ADD ts1 1500 100`,
    * test_rdbs.py:82) — replayed on the engine side to close the
    * serialized in-flight bucket. */
  val FollowUpAdd: (String, Long, Double) = ("ts1", 1500L, 100.0)

  /** Extract-once CSV twins (samples and rule state) at stable paths
    * both engines read — the GltData write-then-atomic-move contract. */
  lazy val (samplesPath: String, rulesPath: String) = {
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
        s"CSV-hostile field in RDB fixture: $s"); s
    }
    val sb = new StringBuilder
    for (s <- series; (ts, v) <- s.samples)
      sb ++= clean(s.key) += ',' ++= ts.toString += ',' ++=
        java.lang.Double.toString(v) += '\n'
    val rb = new StringBuilder
    for ((src, r) <- rules)
      rb ++= clean(src) += ',' ++= clean(r.dest) += ',' ++= clean(r.agg) +=
        ',' ++= r.bucketMs.toString += ',' ++= r.startBucket.toString +=
        ',' ++= java.lang.Double.toString(r.ctx(0)) += ',' ++=
        java.lang.Double.toString(r.ctx(1)) += '\n'
    (emit("rdb_ctx_samples.csv", sb.result()), emit("rdb_ctx_rules.csv", rb.result()))
  }

  /** Decoded raw samples as the engine's long-format frame. */
  def samples(spark: SparkSession): DataFrame =
    spark.read.schema("series STRING, ts LONG, value DOUBLE").csv(samplesPath)

  /** DuckDB CTE over the serialized rule state — the ORACLE's only
    * input: dest naming, bucket geometry and the running (sum, count)
    * all come from the reference's own mid-bucket serialization. */
  lazy val rulesCte: String =
    s"""rdb_rules AS (
       |  SELECT * FROM read_csv('$rulesPath', header=false,
       |    columns={'src':'VARCHAR','dest':'VARCHAR','agg':'VARCHAR',
       |             'bucket_ms':'BIGINT','start_bucket':'BIGINT',
       |             'ctx_val':'DOUBLE','ctx_cnt':'DOUBLE'})
       |)""".stripMargin
}
