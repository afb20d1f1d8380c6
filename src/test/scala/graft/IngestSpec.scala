package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Ingest
import graft.sources.Ingest._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ts_sec", LongType)))

  test("CSV round-trip through the transformer chain to a segment") {
    val csvDir = tmp("graft-csv")
    Seq((1L, "  alice ", "3.5", 7200L), (2L, "bob", "1.25", 10800L))
      .toDF("id", "name", "score", "ts_sec")
      .write.mode("overwrite").option("header", "true").csv(csvDir)

    val segDir = tmp("graft-csv-seg")
    val chain = CompoundTransform(Seq(
      SanitationTransform(Seq("name")),
      ExpressionTransform(Seq("score_pct" -> (col("score") * 100))),
      TimeTransform("ts_sec", "SECONDS", "HOURS"),
      DataTypeTransform(StructType(schema.fields :+
        StructField("score_pct", DoubleType)))))
    Ingest.writeSegment(
      Ingest.readCsv(spark, csvDir, schema), chain, segDir, sortBy = Seq("id"))

    val out = spark.read.parquet(segDir).orderBy("id")
      .as[(Long, String, Double, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "alice", 3.5, 2L, 350.0),
      (2L, "bob", 1.25, 3L, 125.0)))
  }

  test("Avro reader: container round-trip with MV arrays, nulls, and missing declared fields") {
    import graft.sources.AvroConvert
    val mvSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("counts", ArrayType(IntegerType))))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "alice", 3.5, Seq("a", "b"), Seq(1, 2, 3)),
      org.apache.spark.sql.Row(2L, null, 1.25, Seq("c"), Seq.empty[Int]),
      org.apache.spark.sql.Row(3L, "carol", null, null, Seq(7)))
    val dir = tmp("graft-avro")
    val f = new java.io.File(dir, "data.avro")
    AvroConvert.writeFile(rows, mvSchema, f)

    val back = Ingest.readAvro(spark, f.getAbsolutePath, mvSchema)
      .orderBy("id").collect()
    assert(back.length === 3)
    assert(back(0).getLong(0) === 1L && back(0).getString(1) === "alice")
    assert(back(0).getSeq[String](3) === Seq("a", "b"))
    assert(back(0).getSeq[Int](4) === Seq(1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).getSeq[Int](4).isEmpty)
    assert(back(2).isNullAt(2) && back(2).isNullAt(3))

    // a field the avro file lacks: null (reference warns-and-nulls;
    // NullDefaultTransform downstream fills it)
    val widened = StructType(mvSchema.fields :+ StructField("extra", LongType))
    val w = Ingest.readAvro(spark, f.getAbsolutePath, widened).orderBy("id").collect()
    assert(w.forall(_.isNullAt(5)), "missing avro field must read as null")
    // int widening: declared LONG over an avro int field
    val longCounts = StructType(mvSchema.fields.map {
      case StructField("counts", _, _, _) => StructField("counts", ArrayType(LongType))
      case other => other
    })
    val lc = Ingest.readAvro(spark, f.getAbsolutePath, longCounts).orderBy("id").collect()
    assert(lc(0).getSeq[Long](4) === Seq(1L, 2L, 3L))
  }

  test("Thrift reader: binary struct stream by declared-field name, sharded across files") {
    import org.apache.thrift.protocol.TBinaryProtocol
    import org.apache.thrift.transport.TIOStreamTransport
    val dir = tmp("graft-thrift")
    def writeFile(n: String, docs: Seq[(Long, String, Double, Seq[String])]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, n))
      val proto = new TBinaryProtocol(new TIOStreamTransport(out))
      docs.foreach { case (id, name, score, tags) =>
        val d = new graft.sources.ThriftDoc
        d.id = id; d.name = name; d.score = score
        d.tags = new java.util.ArrayList(tags.asJava)
        d.write(proto)
      }
      out.close()
    }
    // two files → two tasks (per-file streams, the splittability story)
    writeFile("a.bin", Seq((1L, "alpha", 1.5, Seq("x", "y")), (2L, "beta", 2.5, Seq())))
    writeFile("b.bin", Seq((3L, "gamma", 3.5, Seq("z"))))

    val declared = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("tags", ArrayType(StringType)),
      StructField("missing_col", StringType))) // declared but absent in the struct
    val df = Ingest.readThrift(spark, dir, classOf[graft.sources.ThriftDoc].getName, declared)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).getSeq[String](3) === Seq("x", "y"))
    assert(rows(1).getSeq[String](3).isEmpty)
    assert(rows.forall(_.isNullAt(4)), "absent thrift field must read as null")
    // int-widening conversion path: declared INT over the i64 field
    val narrow = StructType(Seq(StructField("id", IntegerType)))
    assert(Ingest.readThrift(spark, dir, classOf[graft.sources.ThriftDoc].getName, narrow)
      .orderBy("id").collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))
  }

  test("thrift reader sees fields AFTER a field-id gap (non-contiguous ids)") {
    // ids 1 and 5 — the reference's do/while enumeration would stop at
    // the gap and silently null every later field
    val dir = tmp("graft-thrift-gap")
    val out = new java.io.FileOutputStream(new java.io.File(dir, "g.bin"))
    val proto = new org.apache.thrift.protocol.TBinaryProtocol(
      new org.apache.thrift.transport.TIOStreamTransport(out))
    Seq((7L, "after-the-gap"), (8L, "still-here")).foreach { case (a, b) =>
      val t = new ThriftGapped; t.a = a; t.b = b; t.write(proto)
    }
    out.close()
    val declared = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val rows = Ingest.readThrift(spark, dir, classOf[ThriftGapped].getName, declared)
      .orderBy("a").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(7L, 8L))
    assert(rows.map(_.getString(1)).toSeq === Seq("after-the-gap", "still-here"),
      "fields after an id gap must be read, not silently nulled")
  }

  test("JSON-lines reader with null-default substitution") {
    val dir = tmp("graft-json")
    Files.writeString(java.nio.file.Paths.get(dir, "rows.json"),
      """{"id": 1, "name": "x", "score": 2.0, "ts_sec": 60}
        |{"id": 2, "name": null, "score": null, "ts_sec": 120}
        |""".stripMargin)
    val df = Ingest.readJsonLines(spark, dir, schema)
    val filled = NullDefaultTransform(Map("name" -> "null", "score" -> 0.0))(df)
    val rows = filled.orderBy("id")
      .as[(Long, String, Double, Long)].collect().toSeq
    // reference defaultNullValue: "null" for string dims, 0 for metrics
    assert(rows === Seq((1L, "x", 2.0, 60L), (2L, "null", 0.0, 120L)))
  }

  test("FAILFAST surfaces malformed rows at ingest") {
    val dir = tmp("graft-bad")
    Files.writeString(java.nio.file.Paths.get(dir, "bad.csv"),
      "id,name,score,ts_sec\n1,ok,2.0,60\nnot_a_long,x,y,z\n")
    intercept[Exception] {
      Ingest.readCsv(spark, dir, schema).collect()
    }
  }

  test("config-string expressions compile through the PQL grammar") {
    val df = Seq((2L, 3L)).toDF("a", "b")
    val t = ExpressionTransform.fromConfig(Seq(
      "total" -> "add(a, mult(b, 10))",
      "b_minutes" -> "timeconvert(b, 'SECONDS', 'MINUTES')"))
    val out = t(df).select("total", "b_minutes").as[(Long, Long)].head()
    assert(out === ((32L, 0L)))
    intercept[IllegalArgumentException](
      ExpressionTransform.fromConfig(Seq("x" -> "add(a, b) extra")))
  }

  test("derived sketch columns at ingest (MetricFieldSpec derived-column pattern)") {
    // the reference pre-computes serialized HLL columns at ingest
    // (MetricFieldSpec derived metrics); the same chain here derives
    // MinHash signatures + simhash once at ingest, so dedup queries
    // read the segment without re-tokenizing any text
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content here")).toDF("id", "text")
    val seg = tmp("graft-sketch-seg")
    Ingest.writeSegment(docs, ExpressionTransform(Seq(
      "minhash_sig" -> Dedup.minhashSignature(col("text"), 32, 2),
      "simhash" -> Dedup.simhash64(col("text")),
      "fp64" -> TextAnalysis.fingerprint64(col("text")))), seg)
    val back = spark.read.parquet(seg)
    // dedup directly from the stored signatures — no text re-hash
    val est = back.filter($"id" === 1).select($"minhash_sig").as[Seq[Long]].head()
    val est2 = back.filter($"id" === 2).select($"minhash_sig").as[Seq[Long]].head()
    assert(est === est2, "identical text must yield identical stored signatures")
    val dupPairs = back.as("a").join(back.as("b"),
        $"a.fp64" === $"b.fp64" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSeq
    assert(dupPairs === Seq((1L, 2L)))
  }

  test("DataTypeTransform fails on missing declared fields") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[Exception] {
      DataTypeTransform(schema)(df).collect()
    }
  }

  test("bloomFilterColumns writes a real parquet bloom filter the EQ path can consult") {
    // the reference's segment bloom filter (BloomFilterCreator.java →
    // ColumnValueSegmentPruner EQ check): high-cardinality unsorted
    // string ids, so row-group min/max spans overlap and only the
    // bloom filter can rule a value out
    val ids = (0 until 2000).map(i => (i.toLong, s"user_${i * 7919 % 2000}"))
    val seg = tmp("graft-bloom-seg")
    Ingest.writeSegment(ids.toDF("id", "uid"), CompoundTransform(Nil), seg,
      bloomFilterColumns = Seq("uid"))

    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(seg).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.nonEmpty)
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(files.head.getAbsolutePath), conf))
    try {
      val block = reader.getRowGroups.get(0)
      val uidChunk = block.getColumns.asScala
        .find(_.getPath.toDotString == "uid").get
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(uidChunk)
      assert(bloom != null, "no bloom filter written for 'uid'")
      // every present value must hit (bloom filters have no false negatives)
      val presentInFile = spark.read.parquet(files.head.getAbsolutePath)
        .select($"uid").as[String].collect()
      assert(presentInFile.forall(u =>
        bloom.findHash(bloom.hash(Binary.fromString(u)))))
      // absent values overwhelmingly miss (fpp ~1% ⇒ P(≥half of 40 hit) ≈ 0)
      val absentMisses = (0 until 40).count(i =>
        !bloom.findHash(bloom.hash(Binary.fromString(s"absent_$i"))))
      assert(absentMisses >= 20, s"only $absentMisses/40 absent probes missed")
      // id got no filter — the option is per-column, as in the reference
      val idChunk = block.getColumns.asScala
        .find(_.getPath.toDotString == "id").get
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(idChunk) == null)
    } finally reader.close()

    // the EQ predicate reaches the scan, where parquet consults the bloom
    val plan = spark.read.parquet(seg).filter($"uid" === "user_7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(uid,user_7"), plan)
  }

  test("clearspring HLL codec: serialize/deserialize identity, merge = register max") {
    import graft.functions.ClearspringHll
    val h = ClearspringHll.empty()
    (1 to 500).foreach(i => h.offer(s"item_$i"))
    // byte round-trip through the reference's string encoding
    val s = ClearspringHll.serializeString(h)
    val back = ClearspringHll.deserializeString(s)
    assert(back.log2m === 8)
    assert(back.registers.toSeq === h.registers.toSeq, "round-trip must be lossless")
    // serialized length: 4 (log2m) + 4 (size) + 43 words × 4 for m=256
    assert(ClearspringHll.fromChars(s).length === 8 + 43 * 4)
    // chars stay in the +129 offset plane (printable-ish, no \0)
    assert(s.forall(c => c >= (129 - 128).toChar && c <= (129 + 127).toChar))
    // merge = elementwise register max, and cardinality of a merge of
    // disjoint halves ≈ cardinality of the union built directly
    val a = ClearspringHll.empty(); (1 to 400).foreach(i => a.offer(s"x$i"))
    val b = ClearspringHll.empty(); (301 to 700).foreach(i => b.offer(s"x$i"))
    val direct = ClearspringHll.empty(); (1 to 700).foreach(i => direct.offer(s"x$i"))
    val merged = ClearspringHll.deserializeString(ClearspringHll.serializeString(a))
      .mergeWith(b)
    assert(merged.registers.toSeq === direct.registers.toSeq,
      "merge of overlapping sketches must equal the directly-built union")
    assert(math.abs(merged.cardinality - 700.0) <= 700 * 0.2,
      s"estimate ${merged.cardinality} off for n=700")
    // small-range: a nearly-empty sketch uses linear counting exactly
    val tiny = ClearspringHll.empty(); tiny.offer("only")
    assert(tiny.cardinality === 1L)
    assert(ClearspringHll.empty().cardinality === 0L)
  }

  test("clearspring union agg adopts a non-default log2m from the stream") {
    import graft.functions.ClearspringHll
    // a cluster configured with hll.log2m=12 produces 4096-register
    // sketches; the union must consume them, not demand the default 8
    val h12 = ClearspringHll.empty(log2m = 12)
    (1 to 1000).foreach(i => h12.offer(s"v$i"))
    val col12 = Seq(ClearspringHll.serializeString(h12)).toDF("s")
    val merged = col12
      .select(graft.functions.ClearspringHllCol.unionAgg(col("s")).as("m"))
      .as[String].head()
    val back = ClearspringHll.deserializeString(merged)
    assert(back.log2m === 12)
    assert(back.registers.toSeq === h12.registers.toSeq)
    // mixed log2m within one column still fails loudly
    val h8 = ClearspringHll.empty()
    h8.offer("x")
    val mixed = Seq(ClearspringHll.serializeString(h12),
      ClearspringHll.serializeString(h8)).toDF("s")
    val e = intercept[org.apache.spark.SparkException] {
      mixed.repartition(1)
        .select(graft.functions.ClearspringHllCol.unionAgg(col("s"))).collect()
    }
    assert(e.getMessage.contains("cannot merge") ||
      String.valueOf(e.getCause).contains("cannot merge"))
  }

  test("clearspring-serialized segment round-trips to a green FASTHLL-style union") {
    import graft.functions.{ClearspringHll, ClearspringHllCol}
    // a "reference-produced segment": per-(grp, shard) derived _hll
    // string column over known value universes
    val rows = for (grp <- Seq("a", "b"); shard <- 0 until 8) yield {
      val h = ClearspringHll.empty()
      // shards overlap heavily within a group: union must dedup
      val vals = (0 until 600).map(i => s"${grp}_v${(i + shard * 37) % 800}")
      vals.foreach(h.offer)
      (grp, shard, ClearspringHll.serializeString(h))
    }
    val seg = tmp("cshll_seg")
    rows.toDF("grp", "shard", "views_hll").write.mode("overwrite").parquet(seg)
    // re-read the segment and answer FASTHLL per group + overall
    val got = spark.read.parquet(seg)
      .groupBy($"grp")
      .agg(ClearspringHllCol.cardinality(
        ClearspringHllCol.unionAgg($"views_hll")).as("dc"))
      .orderBy($"grp").as[(String, Long)].collect().toSeq
    // each group's true distinct universe is exactly 800 values
    got.foreach { case (g, dc) =>
      assert(math.abs(dc - 800.0) <= 800 * 0.2, s"group $g estimate $dc vs 800")
    }
    // the merged sketch re-serializes into the same reference format
    // (storable back into a segment and still consumable)
    val mergedStr = spark.read.parquet(seg)
      .agg(ClearspringHllCol.unionAgg($"views_hll")).as[String].head()
    val overall = ClearspringHll.deserializeString(mergedStr).cardinality
    assert(math.abs(overall - 1600.0) <= 1600 * 0.2, s"overall $overall vs 1600")
  }
}
