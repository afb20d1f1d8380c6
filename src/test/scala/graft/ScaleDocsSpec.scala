package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.ScaleDocs

/** The synthetic pipeline corpus ([[graft.queries.ScaleDocs]]): the
  * planted duplicate structure must hold exactly (it is the scale
  * bench's correctness oracle), generation must be deterministic
  * across partitionings, and the staged signature path must equal the
  * direct near-dup pipeline. */
class ScaleDocsSpec extends SparkSpec {
  import spark.implicits._

  private val N = 2000L
  private lazy val docs = ScaleDocs.docsFrame(spark, N).cache()

  test("generation is deterministic and partitioning-independent") {
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = ScaleDocs.docsFrame(spark, N).repartition(7)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    val e1 = ScaleDocs.embeddingsFrame(spark, 100).orderBy("vec_id").collect().map(_.toSeq)
    val e2 = ScaleDocs.embeddingsFrame(spark, 100).repartition(3)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(e1.toSeq == e2.toSeq)
    assert(e1.head(1).asInstanceOf[scala.collection.Seq[Float]].size == 64)
  }

  test("planted exact duplicates: ids ≡ 1 (mod 50) equal id−1, survivors match") {
    val withBase = docs.as("a").join(docs.as("b"),
      col("a.doc_id") === col("b.doc_id") + 1 &&
        pmod(col("a.doc_id"), lit(50)) === 1)
    assert(withBase.filter(col("a.text") =!= col("b.text")).count() == 0)
    val survivors = Dedup.exactDedup(docs, "doc_id", "text").count()
    assert(survivors == N - (N + 48) / 50,
      s"survivors $survivors vs expected ${N - (N + 48) / 50}")
  }

  test("near-dup pipeline: staged == direct, recall and precision 1.0 on planted pairs") {
    val direct = Dedup.nearDupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val staged = Dedup.nearDupPairsStaged(docs, "doc_id", "text", sigs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct == staged)
    val planted = ScaleDocs.plantedPairs(spark, N)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.size == (N / 50) * 3)
    assert((planted -- staged).isEmpty,
      s"missed planted pairs: ${(planted -- staged).take(5)}")
    assert((staged -- planted).isEmpty,
      s"spurious pairs: ${(staged -- planted).take(5)}")
  }
}
