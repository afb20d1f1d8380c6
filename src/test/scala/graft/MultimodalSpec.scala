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

  test("imageMeta parses PNG/JPEG/GIF headers; cross-checked against the JDK codecs") {
    import java.io.ByteArrayOutputStream
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // fixtures encoded by the JDK's OWN codecs — an independent
    // implementation of the container formats our kernel parses
    def jdkImage(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (x * 31 + y * 57) & 0xffffff)))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer?")
      out.toByteArray
    }
    val cases = Seq(
      ("png", jdkImage(123, 45, "png"), 123, 45),
      ("jpeg", jdkImage(640, 480, "jpg"), 640, 480),
      ("gif", jdkImage(7, 300, "gif"), 7, 300),
      // our own spec-level PNG writer agrees with the kernel too
      ("png", Multimodal.makePng(64, 48, seed = 9), 64, 48))
    val got = cases.map(_._2).toDF("blob")
      .select(Multimodal.imageMeta($"blob").as("m"))
      .select($"m.format", $"m.width", $"m.height")
      .as[(String, Option[Int], Option[Int])].collect().toSeq
    assert(got === cases.map(c => (c._1, Some(c._3), Some(c._4))))
    // and the JDK can decode our makePng output back to the same dims
    val round = ImageIO.read(new java.io.ByteArrayInputStream(Multimodal.makePng(31, 17, 2)))
    assert(round != null && round.getWidth === 31 && round.getHeight === 17,
      "makePng must emit a VALID png, not just a parseable header")
    // non-image bytes => all-null metadata, and asMedia falls back to -1
    val junk = Seq("not an image".getBytes("UTF-8"), Array[Byte](0xff.toByte, 0xd8.toByte))
      .toDF("blob")
      .select(Multimodal.asMedia($"blob", lit("application/octet-stream")).as("media"))
      .select($"media.width", $"media.height").as[(Int, Int)].collect()
    assert(junk.forall(_ == ((-1, -1))))
    // explicit manifest dims still override the parse
    val over = Seq(Multimodal.makePng(10, 10, 1)).toDF("blob")
      .select(Multimodal.asMedia($"blob", lit("image/png"), lit(99), lit(98)).as("m"))
      .select($"m.width", $"m.height").as[(Int, Int)].head()
    assert(over === ((99, 98)))
  }

  test("imageIoExtractor REALLY decodes: mean channel values match the pixels written") {
    // a solid-color PNG via the JDK encoder: mean R/G/B must equal the
    // constant pixel exactly
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, 0x406080)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val feats = Multimodal.imageIoExtractor(Seq(out.toByteArray, "junk".getBytes))
    assert(feats.head.toSeq === Seq(8.0, 4.0, 0x40.toDouble, 0x60.toDouble, 0x80.toDouble))
    assert(feats(1).forall(_.isNaN), "undecodable blob yields NaN row, not a throw")
    // end to end through the partition-batched plumbing
    val df2 = Seq((1L, out.toByteArray)).toDF("id", "blob")
    val got = Multimodal.batchedFeatures(df2, "blob", "id", 16, Multimodal.imageIoExtractor)
      .select($"features").as[Seq[Double]].head()
    assert(got === Seq(8.0, 4.0, 64.0, 96.0, 128.0))
  }

  test("audioMeta parses WAV/AU headers; cross-checked against the JDK's own encoder") {
    import javax.sound.sampled._
    // fixtures encoded by the JDK's OWN writer — an independent
    // implementation of the containers our kernel parses
    def jdkAudio(rate: Float, ch: Int, frames: Int,
        typ: AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, ch, true, typ == AudioFileFormat.Type.AU)
      val pcm = new Array[Byte](frames * ch * 2)
      pcm.indices.foreach(i => pcm(i) = ((i * 13) & 0x7f).toByte)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames), typ, out)
      out.toByteArray
    }
    val cases = Seq(
      ("wav", jdkAudio(44100, 2, 22050, AudioFileFormat.Type.WAVE), 44100, 2, 16, 500L),
      ("wav", jdkAudio(8000, 1, 12000, AudioFileFormat.Type.WAVE), 8000, 1, 16, 1500L),
      ("au", jdkAudio(16000, 1, 4000, AudioFileFormat.Type.AU), 16000, 1, 16, 250L),
      // our own spec-level WAV writer agrees with the kernel too
      ("wav", Multimodal.makeWav(12000, 6000, seed = 3), 12000, 1, 16, 500L))
    val got = cases.map(_._2).toDF("blob")
      .select(Multimodal.audioMeta($"blob").as("m"))
      .select($"m.format", $"m.sample_rate", $"m.channels", $"m.bits", $"m.duration_ms")
      .as[(String, Option[Int], Option[Int], Option[Int], Option[Long])].collect().toSeq
    assert(got === cases.map(c => (c._1, Some(c._3), Some(c._4), Some(c._5), Some(c._6))))
    // non-audio bytes => all-null metadata
    val junk = Seq("not audio at all".getBytes("UTF-8"), "RIFFxxxxJUNK".getBytes("UTF-8"))
      .toDF("blob")
      .select(Multimodal.audioMeta($"blob").as("m"))
      .select($"m.format".isNull, $"m.sample_rate".isNull).as[(Boolean, Boolean)].collect()
    assert(junk.forall(_ == ((true, true))))
  }

  test("audioIoExtractor REALLY decodes: RMS matches the samples written") {
    // constant-amplitude PCM16 mono: RMS must equal |sample|/32768 exactly
    val frames = 4000
    val buf = java.nio.ByteBuffer.allocate(44 + frames * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val const: Short = 16384 // 0.5 amplitude
    buf.put(Multimodal.makeWav(8000, 0, 0), 0, 36) // header through "fmt " chunk
    buf.put("data".getBytes("US-ASCII")).putInt(frames * 2)
    (0 until frames).foreach(_ => buf.putShort(const))
    val wav = buf.array()
    // fix RIFF size field for the real data length
    java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + frames * 2)
    val feats = Multimodal.audioIoExtractor(Seq(wav, "junk".getBytes))
    assert(feats.head.toSeq === Seq(8000.0, 1.0, 4000.0, 0.5, 0.5))
    assert(feats(1).forall(_.isNaN), "undecodable blob yields NaN row, not a throw")
    // makeWav end to end through the partition-batched plumbing:
    // decoded frame count and duration match the generator arguments
    val df2 = Seq((1L, Multimodal.makeWav(16000, 8000, seed = 7))).toDF("id", "blob")
    val got = Multimodal.batchedFeatures(df2, "blob", "id", 16, Multimodal.audioIoExtractor)
      .select($"features").as[Seq[Double]].head()
    assert(got(0) === 16000.0 && got(1) === 1.0 && got(2) === 8000.0 && got(3) === 0.5)
    assert(got(4) > 0.0 && got(4) < 1.0, "seeded pattern has nonzero bounded RMS")
  }

  test("videoMeta walks ISO-BMFF boxes: ftyp/mvhd/tkhd from a spec-level fixture") {
    val cases = Seq(
      (Multimodal.makeMp4(1920, 1080, 90000L), 1920, 1080, 90000L),
      (Multimodal.makeMp4(640, 360, 1500L, timescale = 600), 640, 360, 1500L),
      (Multimodal.makeMp4(16, 16, 0L), 16, 16, 0L))
    val got = cases.map(_._1).toDF("blob")
      .select(Multimodal.videoMeta($"blob").as("m"))
      .select($"m.format", $"m.width", $"m.height", $"m.duration_ms")
      .as[(String, Option[Int], Option[Int], Option[Long])].collect().toSeq
    assert(got === cases.map(c => ("mp4", Some(c._2), Some(c._3), Some(c._4))))
    // non-video bytes (including a plausible box-like prefix) => all-null
    val junk = Seq("not a video".getBytes("UTF-8"),
        Multimodal.makePng(4, 4, 1), "   ftyp".getBytes)
      .toDF("blob")
      .select(Multimodal.videoMeta($"blob").as("m"))
      .select($"m.format".isNull).as[Boolean].collect()
    assert(junk.forall(identity))
  }

  test("media kernels survive malformed edges: empty tkhd tail, unknown mvhd duration, short fmt chunk") {
    import graft.functions.MediaOps
    // empty 8-byte tkhd box ending the blob: size==header admits it,
    // the payload read must bounds-check instead of throwing AIOOBE
    val emptyTkhdTail = Array[Byte](0, 0, 0, 8, 't', 'k', 'h', 'd')
    assert(MediaOps.videoMeta(emptyTkhdTail) != null) // total, no throw
    // ISO-BMFF reserves all-ones mvhd duration as "unknown": the row
    // keeps format but duration_ms must be null, not ~49.7 days
    val unknownDur = Multimodal.makeMp4(320, 240, 0xffffffffL)
    val r = MediaOps.videoMeta(unknownDur)
    assert(r.getUTF8String(0).toString === "mp4" && r.isNullAt(3))
    // a fmt chunk declaring len<16 must not read the NEXT chunk's
    // bytes as format fields: the wav falls to unknown, all-null
    val wav = Multimodal.makeWav(8000, 256, 1)
    val lenField = java.nio.ByteBuffer.wrap(wav, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(lenField.getInt === 16) // canonical fmt length in our fixture
    val short = wav.clone()
    short(16) = 0 // fmt len := 0
    assert(MediaOps.audioMeta(short).isNullAt(0))
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
