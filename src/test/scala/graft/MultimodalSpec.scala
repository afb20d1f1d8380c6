package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "hello world"), (2L, "a"), (3L, "the quick brown fox é¿")
  ).toDF("id", "text")
    .select($"id", encode($"text", "UTF-8").as("blob"), $"text")

  test("asMedia carries content, mime and byte-accurate metadata") {
    val m = df.select($"id", Multimodal.asMedia($"blob", lit("text/plain"),
      lit(640), lit(480)).as("media"))
    val row = m.filter($"id" === 3)
      .select($"media.mime", $"media.byte_len", $"media.width", $"media.height")
      .as[(String, Long, Int, Int)].head()
    // "é¿" is 2 multi-byte chars: byte_len > char count proves bytes, not chars
    assert(row === (("text/plain", "the quick brown fox é¿".getBytes("UTF-8").length.toLong, 640, 480)))
  }

  test("stubFeatures: fixed dim, [0,1) range, deterministic") {
    val f = df.select($"id", Multimodal.stubFeatures($"blob", 8).as("f"))
    val rows = f.select(size($"f"), forall($"f", x => x >= 0 && x < 1))
      .as[(Int, Boolean)].collect()
    assert(rows.forall(_ == ((8, true))))
    val a = f.orderBy("id").as[(Long, Seq[Double])].collect().toSeq
    val b = f.orderBy("id").as[(Long, Seq[Double])].collect().toSeq
    assert(a === b, "re-run must reproduce identical features")
  }

  test("frameSample chunks reassemble to the original bytes") {
    val rows = df.select($"id", $"blob", Multimodal.frameSample($"blob", 4).as("frames"))
      .as[(Long, Array[Byte], Seq[Array[Byte]])].collect()
    rows.foreach { case (id, blob, frames) =>
      assert(frames.length === 4, s"id=$id")
      assert(frames.flatten.take(blob.length).toSeq === blob.toSeq, s"id=$id reassembly")
    }
  }

  test("batchedFeatures preserves ids across batch boundaries") {
    val many = (1L to 7L).map(i => (i, s"doc number $i")).toDF("id", "text")
      .select($"id", encode($"text", "UTF-8").as("blob"))
    val out = Multimodal.batchedFeatures(many, "blob", "id",
        batchSize = 2, Multimodal.byteStatsExtractor(4))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(out.map(_._1).toSeq === (1L to 7L))
    out.foreach { case (id, f) =>
      assert(f.length === 4)
      assert(f.head === s"doc number $id".getBytes("UTF-8").length.toDouble)
    }
  }
}
