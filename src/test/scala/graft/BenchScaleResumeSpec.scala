package graft

import org.scalatest.funsuite.AnyFunSuite

/** A resumed partial ladder must reassemble the whole artifact: the
  * flush-per-point contract is only honest if sections completed by a
  * previous invocation survive a re-run restricted to the missing
  * tags (the exact interrupted-ladder scenario a multi-hour run
  * hits). */
class BenchScaleResumeSpec extends AnyFunSuite {

  private def withReport(body: String)(f: String => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("bench_scale_resume", ".json")
    try {
      java.nio.file.Files.write(p, body.getBytes)
      f(p.toString)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("existing sections parse back as raw tag -> body text") {
    val report =
      """{"bench":"scale","env":{"cpus":"32","mem_gb":32,"engine":"spark-local[32]"},""" +
        """"sf1":{"rows":100000,"queries":{"a1":{"p50":0.1,"reps":[0.1,0.2]}},""" +
        """"startree":{"speedup":3.0}},""" +
        """"sf100":{"rows":10000000,"classes":{"agg":{"qps":4.0}}}}"""
    withReport(report) { path =>
      val secs = BenchScale.existingSections(path).toMap
      assert(secs.keySet === Set("bench", "env", "sf1", "sf100"))
      assert(secs("sf1").startsWith(""""sf1":{"rows":100000"""))
      assert(secs("sf1").endsWith(""""startree":{"speedup":3.0}}"""))
      assert(secs("sf100") ===
        """"sf100":{"rows":10000000,"classes":{"agg":{"qps":4.0}}}""")
      // nested braces inside quoted strings must not derail matching
      val tricky = """{"env":{"engine":"local[32]{x}"},"sf1":{"rows":1}}"""
      withReport(tricky) { p2 =>
        val s2 = BenchScale.existingSections(p2).toMap
        assert(s2("sf1") === """"sf1":{"rows":1}""")
      }
    }
  }

  test("mergeSubsection replaces or appends one entry inside a tag") {
    val report =
      """{"bench":"scale","sf100":{"rows":10000000,""" +
        """"pipeline":{"p1":{"p50":3.0}},"classes":{"agg":{"qps":4.0}}},""" +
        """"sf1000":{"rows":100000000,"classes":{"agg":{"qps":2.0}}}}"""
    withReport(report) { path =>
      // replace an existing subsection — every other byte survives
      BenchScale.mergeSubsection(path, "sf100", """"pipeline":{"p1":{"p50":1.5}}""")
      val s1 = BenchScale.existingSections(path).toMap
      assert(s1("sf100").contains(""""pipeline":{"p1":{"p50":1.5}}"""))
      assert(s1("sf100").contains(""""classes":{"agg":{"qps":4.0}}"""))
      assert(s1("sf1000") === """"sf1000":{"rows":100000000,"classes":{"agg":{"qps":2.0}}}""")
      // append when the subsection is absent
      BenchScale.mergeSubsection(path, "sf1000", """"pipeline":{"p4":{"p50":240.0}}""")
      val s2 = BenchScale.existingSections(path).toMap
      assert(s2("sf1000").endsWith(""""pipeline":{"p4":{"p50":240.0}}}"""))
      // a missing target tag is a loud failure, not a silent new section
      intercept[IllegalArgumentException] {
        BenchScale.mergeSubsection(path, "sf42", """"pipeline":{}""")
      }
    }
  }

  test("missing and malformed files degrade to no kept sections") {
    assert(BenchScale.existingSections("/nonexistent/bench.json").isEmpty)
    withReport("not json at all") { p =>
      assert(BenchScale.existingSections(p).isEmpty)
    }
    withReport("""{"sf1":{"rows":1""") { p => // truncated mid-section
      assert(BenchScale.existingSections(p).isEmpty)
    }
  }
}
