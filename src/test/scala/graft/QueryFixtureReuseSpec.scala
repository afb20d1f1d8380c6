package graft

import org.apache.spark.sql.DataFrame

/** r12 optimization guards: the per-(session, table) fixture caches
  * added this round (Minion input segments, retention pristine copy,
  * CSV/JSON/Avro/Thrift source fixtures) must leave every query
  * IDEMPOTENT — a second execution in the same session reuses the
  * fixture and must produce the identical result, because the bench
  * times exactly that second (and third) execution. The retention row
  * is the sharp case: the operator DELETES segments, so reuse only
  * works if the working copy is restored from the pristine fixture
  * before every run. */
class QueryFixtureReuseSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private val reused = Seq(
    "q_retention", "q_merge_rollup", "q_purge_segment",
    "q_csv_ingest", "q_json_ingest", "q_avro_ingest", "q_thrift_ingest",
    "q_derived_hll")

  reused.foreach { name =>
    test(s"$name is idempotent across executions in one session") {
      val fn = SparkEntry.queries(name)
      val first = rows(fn(spark, sfDir))
      val second = rows(fn(spark, sfDir))
      assert(first.nonEmpty, s"$name returned no rows")
      assert(first === second,
        s"$name changed across executions — fixture reuse is unsound")
    }
  }

  test("retention pristine fixture keeps every slice after a run") {
    // two executions happened above; the PRISTINE copy must still hold
    // the full slice set (only the working copy is pruned)
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_") +
      f"_${sfDir.hashCode & 0xffffffffL}%08x"
    val pristine = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_retention_pr_$tag")
    val work = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_retention_$tag")
    def slices(d: java.io.File): Set[String] =
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("slice_id="))
        .map(_.getName).toSet
    assert(pristine.isDirectory, "pristine retention fixture missing")
    val ps = slices(pristine)
    val ws = slices(work)
    assert(ps.nonEmpty)
    assert(ws.subsetOf(ps) && ws.size < ps.size,
      s"retention must delete some working slices but never pristine ones " +
        s"(pristine=$ps, work=$ws)")
  }
}
