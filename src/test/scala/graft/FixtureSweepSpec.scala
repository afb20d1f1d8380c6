package graft

import java.io.File
import java.nio.file.Files

import graft.pql.CorpusHarness

/** Startup sweep of per-pid corpus fixture dirs
  * ([[CorpusHarness.sweepStaleFixtureDirs]]) — added after the
  * round-12 scale ladder lost ~26 GB of /tmp to fixture dirs from
  * finished harness JVMs. The sweep must remove exactly the dirs
  * whose embedded pid is dead, and nothing else. */
class FixtureSweepSpec extends SparkSpec {

  private val tmp = new File(System.getProperty("java.io.tmpdir"))

  /** A pid guaranteed not to name a live process: walk down from
    * above Linux's default pid ceiling until ProcessHandle can't see
    * one (the first candidate virtually always wins). */
  private def deadPid(): Long =
    Iterator.iterate(4500000L)(_ - 7919)
      .find(p => !java.lang.ProcessHandle.of(p).isPresent)
      .get

  private def mkFixtureDir(name: String): File = {
    val d = new File(tmp, name)
    assert(d.mkdirs(), s"could not create $d")
    Files.write(new File(d, "part-00000.parquet").toPath, Array[Byte](1, 2, 3))
    d
  }

  test("sweep removes dead-pid fixture dirs, keeps live-pid and unrelated dirs") {
    // touch the object FIRST: its init-time sweep must not race the
    // fixtures this test plants (init runs on first access)
    CorpusHarness.sweepStaleFixtureDirs()
    val dead = deadPid()
    val self = java.lang.ProcessHandle.current().pid()
    val deadFact = mkFixtureDir(s"graft_corpus_fx_424242_stfact_$dead")
    val deadTree = mkFixtureDir(s"graft_corpus_fx_424242_startree_${dead}_6x8_0")
    val liveFact = mkFixtureDir(s"graft_corpus_fx_424242_stfact_$self")
    // pid-less base dir + near-miss names must survive (sweep scope
    // is exactly the two per-pid shapes CorpusHarness writes)
    val base = mkFixtureDir("graft_corpus_fx_424242")
    val nearMiss = mkFixtureDir(s"graft_other_fx_424242_stfact_$dead")
    try {
      val removed = CorpusHarness.sweepStaleFixtureDirs()
      assert(removed >= 2, s"expected >=2 removals, got $removed")
      assert(!deadFact.exists(), "dead-pid stfact dir survived the sweep")
      assert(!deadTree.exists(), "dead-pid startree dir survived the sweep")
      assert(liveFact.exists(), "sweep removed a LIVE pid's fixture dir")
      assert(base.exists(), "sweep removed the shared pid-less base dir")
      assert(nearMiss.exists(), "sweep removed a dir outside its name scope")
    } finally {
      Seq(deadFact, deadTree, liveFact, base, nearMiss).foreach { d =>
        Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
      }
    }
  }
}
