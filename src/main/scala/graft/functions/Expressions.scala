package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-row kernels (MinHash,
  * SimHash, cosine, hyperplane LSH). Each generates a single static
  * call into [[HashOps]] via `defineCodeGen`, so the surrounding plan
  * stays inside whole-stage codegen — the Spark-native analogue of the
  * reference's block-oriented `TransformFunction`s
  * (`pinot-core/.../operator/transform/function/BaseTransformFunction.java:1-426`),
  * which are its mechanism for keeping per-row work out of the
  * interpreter.
  *
  * All expressions declare `inputTypes` via [[ImplicitCastInputTypes]]
  * so Catalyst inserts casts where needed (e.g. array<int> →
  * array<double>) and rejects wrong-typed inputs at ANALYSIS time
  * instead of failing inside generated code at execution; float
  * vectors are accepted natively (see [[VecArray]]).
  *
  * Preference order per the project brief: built-in functions first;
  * these expressions exist exactly where the built-in higher-order
  * functions (`transform`/`aggregate`/`zip_with`) are interpreted
  * per-element and were measured dominating the benchmark.
  */
object exprs {

  private val DoubleArray: GraftSqlBridge.AbstractType = ArrayType(DoubleType)
  private val LongArray: GraftSqlBridge.AbstractType = ArrayType(LongType)

  /** Vector input type: array<double> OR array<float>, accepted
    * NATIVELY (double listed first = the implicit-cast target for
    * other numeric arrays). Embeddings at corpus scale are float32;
    * forcing a Cast to array<double> allocated a fresh array per
    * EVALUATION — inside a knn-join's pair loop that was corpus_rows ×
    * queries allocations per scan. The kernels read either layout and
    * widen per element, which is bit-identical to what the Cast
    * produced. */
  private val VecArray: GraftSqlBridge.AbstractType =
    GraftSqlBridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType))

  /** Is this child's resolved type a float vector? Baked into the
    * generated kernel call as a constant. */
  private def isF(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** MinHash signature of a text column → array<bigint> of running
    * minima over `numHashes` double-hashed XXH64 functions. */
  case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.minhashSig(input.asInstanceOf[UTF8String], numHashes, shingleSize)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.minhashSig($c, $numHashes, $shingleSize)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  /** SimHash-64 of a text column → bigint. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      HashOps.simhash64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
    override def prettyName: String = "simhash64"
  }

  /** Cosine similarity of two float/double vector columns → double. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray, VecArray)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.cosineAny(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isF(left), isF(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.cosineAny($a, $b, ${isF(left)}, ${isF(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim"
  }

  /** Dot product of two float/double vector columns → double. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray, VecArray)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.dotAny(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isF(left), isF(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.dotAny($a, $b, ${isF(left)}, ${isF(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }

  /** Euclidean distance of two float/double vector columns → double
    * (single-pass stable sum((a_i-b_i)^2) kernel). */
  case class L2Distance(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray, VecArray)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.l2DistanceAny(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isF(left), isF(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.l2DistanceAny($a, $b, ${isF(left)}, ${isF(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
      copy(left = l, right = r)
    override def prettyName: String = "l2_distance"
  }

  /** Cosine similarity of two PACKED float32-LE binary vectors
    * (the fixed-width raw-forward-index layout — no per-element
    * ArrayData accessor on the hot path). */
  case class CosineSimPacked(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.cosinePacked(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.cosinePacked($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimPacked =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim_packed"
  }

  /** Dot product of two packed float32-LE binary vectors. */
  case class DotProductPacked(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.dotPacked(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.dotPacked($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductPacked =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product_packed"
  }

  /** Euclidean distance of two packed float32-LE binary vectors
    * (single-pass stable sum((a_i-b_i)^2) kernel). */
  case class L2DistancePacked(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.l2Packed(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.l2Packed($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistancePacked =
      copy(left = l, right = r)
    override def prettyName: String = "l2_distance_packed"
  }

  /** array<float|double> → packed float32-LE binary (narrowing from
    * double, as a float32 embedding store would). */
  case class PackFloats(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      HashOps.packFloats(v.asInstanceOf[ArrayData], isF(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.packFloats($c, ${isF(child)})")
    override protected def withNewChildInternal(newChild: Expression): PackFloats =
      copy(child = newChild)
    override def prettyName: String = "pack_floats"
  }

  /** Packed float32-LE binary → array<float> ([[PackFloats]] inverse;
    * bit-exact round trip for float inputs). */
  case class UnpackFloats(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashOps.unpackFloats(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.unpackFloats($c)")
    override protected def withNewChildInternal(newChild: Expression): UnpackFloats =
      copy(child = newChild)
    override def prettyName: String = "unpack_floats"
  }

  /** Random-hyperplane LSH bucket of an array<double> column → bigint
    * with the low `numPlanes` bits populated. */
  case class LshBucket(child: Expression, numPlanes: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(numPlanes > 0 && numPlanes <= 63,
      s"numPlanes must be in [1, 63], got $numPlanes")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      HashOps.lshBucketAny(input.asInstanceOf[ArrayData], numPlanes, isF(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.lshBucketAny($c, $numPlanes, ${isF(child)})")
    override protected def withNewChildInternal(newChild: Expression): LshBucket =
      copy(child = newChild)
    override def prettyName: String = "lsh_bucket"
  }

  /** OR-amplified multi-table LSH buckets → array<bigint> of
    * `numTables` independent bucket ids (HashOps.lshBuckets). */
  case class LshBuckets(child: Expression, numPlanes: Int, numTables: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(numPlanes > 0 && numPlanes <= 63,
      s"numPlanes must be in [1, 63], got $numPlanes")
    require(numTables > 0, s"numTables must be positive, got $numTables")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(VecArray)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.lshBucketsAny(input.asInstanceOf[ArrayData], numPlanes, numTables,
        isF(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.lshBucketsAny($c, $numPlanes, $numTables, ${isF(child)})")
    override protected def withNewChildInternal(newChild: Expression): LshBuckets =
      copy(child = newChild)
    override def prettyName: String = "lsh_buckets"
  }

  /** IVF coarse-quantizer assignment: nearest centroid id by L2. The
    * codebook is a constructor argument, so it serializes with the
    * plan to every executor (broadcast semantics with zero driver
    * bookkeeping) and lands in generated code via a reference object. */
  case class NearestCell(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(centroids.nonEmpty, "empty codebook")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleArray)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      HashOps.nearestCellAny(input.asInstanceOf[ArrayData], centroids, isF(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.nearestCellAny($c, $ref, ${isF(child)})")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCell =
      copy(child = newChild)
    override def prettyName: String = "nearest_cell"
  }

  /** IVF probe list: the `nprobe` nearest cells, ascending distance. */
  case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(centroids.nonEmpty, "empty codebook")
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleArray)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.nearestCellsAny(input.asInstanceOf[ArrayData], centroids, nprobe,
        isF(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.nearestCellsAny($c, $ref, $nprobe, ${isF(child)})")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
    override def prettyName: String = "nearest_cells"
  }

  /** Winnowing rolling-hash fingerprint → sorted array<bigint>
    * (HashOps.winnow). */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.winnow(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.winnow($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
      copy(child = newChild)
    override def prettyName: String = "winnow_fingerprint"
  }

  /** One-pass text quality metrics struct (HashOps.textStats). */
  /** Dictionary decode: `values[id]` — O(1) array lookup inside
    * whole-stage codegen. The query-time half of the dictionary-encoded
    * dimension layout ([[graft.plans.DictLayout]]): group-bys run on
    * int dict ids and this expression restores the string value at
    * output (per GROUP, not per row). The values array ships with the
    * serialized expression, bounded by the layout's cardinality cap. */
  case class DictDecode(child: Expression, values: Array[UTF8String])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(IntegerType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val i = input.asInstanceOf[Int]
      if (i < 0 || i >= values.length) HashOps.dictDecodeOob(i, values.length)
      values(i)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dictValues", values,
        "org.apache.spark.unsafe.types.UTF8String[]")
      // loud, NAMED failure on a stale/mismatched segment instead of a
      // bare ArrayIndexOutOfBoundsException from generated code (the
      // documented -1 non-null sentinel lands here too)
      nullSafeCodeGen(ctx, ev, c => s"""
        if ($c < 0 || $c >= ${values.length}) {
          graft.functions.HashOps.dictDecodeOob($c, ${values.length});
        }
        ${ev.value} = $ref[$c];""")
    }
    override protected def withNewChildInternal(newChild: Expression): DictDecode =
      copy(child = newChild)
    override def prettyName: String = "dict_decode"
  }

  /** Dictionary encode: binary search of a string in the SORTED values
    * array → int id, null when absent. The ingest-time half of
    * [[graft.plans.DictLayout]] (one log₂(n)-compare lookup per row,
    * build-once per segment write). */
  case class DictId(child: Expression, values: Array[UTF8String])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val idx = java.util.Arrays.binarySearch(
        values.asInstanceOf[Array[AnyRef]], input.asInstanceOf[UTF8String])
      if (idx < 0) null else idx
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dictValues", values,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val idx = ctx.freshName("dictIdx")
      nullSafeCodeGen(ctx, ev, c => s"""
        int $idx = java.util.Arrays.binarySearch((Object[]) $ref, $c);
        if ($idx < 0) { ${ev.isNull} = true; }
        else { ${ev.value} = $idx; }""")
    }
    override protected def withNewChildInternal(newChild: Expression): DictId =
      copy(child = newChild)
    override def prettyName: String = "dict_id"
  }

  /** Token count as a byte scan (HashOps.tokenCount) — exact twin of
    * `size(filter(split(trim(text), "\\s+"), length(_) > 0))` without
    * the regex engine or the per-row token array. */
  case class TokenCount(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      HashOps.tokenCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.tokenCount($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenCount =
      copy(child = newChild)
    override def prettyName: String = "token_count"
  }

  /** Whitespace/case normalization in one byte pass
    * (HashOps.normalizeWs) — exact twin of
    * `regexp_replace(lower(trim(text)), "\\s+", " ")`, the
    * fingerprint/dedup normalizer. */
  case class NormalizeWs(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      HashOps.normalizeWs(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.normalizeWs($c)")
    override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
      copy(child = newChild)
    override def prettyName: String = "normalize_ws"
  }

  case class TextStats(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("mean_token_len", DoubleType, nullable = false),
      StructField("stopword_ratio", DoubleType, nullable = false),
      StructField("punct_ratio", DoubleType, nullable = false),
      StructField("digit_ratio", DoubleType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      HashOps.textStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.textStats($c)")
    override protected def withNewChildInternal(newChild: Expression): TextStats =
      copy(child = newChild)
    override def prettyName: String = "text_stats"
  }

  /** One-pass repetition metrics struct (HashOps.repetitionStats —
    * the Gopher-style repetition quality filters). `delim` is the
    * unit separator (lines/sentences), fixed at plan time. */
  case class RepetitionStats(child: Expression, delim: String)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_units", IntegerType, nullable = false),
      StructField("dup_unit_frac", DoubleType, nullable = false),
      StructField("dup_unit_char_frac", DoubleType, nullable = false),
      StructField("top_bigram_char_frac", DoubleType, nullable = false),
      StructField("dup_5gram_char_frac", DoubleType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      HashOps.repetitionStats(input.asInstanceOf[UTF8String], delim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val delimRef = ctx.addReferenceObj("delim", delim, "java.lang.String")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.repetitionStats($c, $delimRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
    override def prettyName: String = "repetition_stats"
  }

  /** Image header metadata ([[MediaOps.imageMeta]]): (format, width,
    * height) parsed from the blob's leading bytes (PNG IHDR / JPEG
    * SOFn / GIF screen descriptor); all-null fields when the blob is
    * not a recognized raster image. */
  case class ImageMeta(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    override def nullSafeEval(input: Any): Any =
      MediaOps.imageMeta(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.MediaOps.imageMeta($c)")
    override protected def withNewChildInternal(newChild: Expression): ImageMeta =
      copy(child = newChild)
    override def prettyName: String = "image_meta"
  }

  /** Audio container metadata ([[MediaOps.audioMeta]]): (format,
    * sample_rate, channels, bits, duration_ms) parsed from the blob's
    * leading bytes (RIFF/WAVE chunk walk, Sun AU header); all-null
    * fields when the blob is not recognized audio. */
  case class AudioMeta(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    override def nullSafeEval(input: Any): Any =
      MediaOps.audioMeta(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.MediaOps.audioMeta($c)")
    override protected def withNewChildInternal(newChild: Expression): AudioMeta =
      copy(child = newChild)
    override def prettyName: String = "audio_meta"
  }

  /** Video container metadata ([[MediaOps.videoMeta]]): (format, width,
    * height, duration_ms) from an ISO-BMFF (MP4/QuickTime) box walk;
    * all-null fields when the blob is not recognized video. */
  case class VideoMeta(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    override def nullSafeEval(input: Any): Any =
      MediaOps.videoMeta(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.MediaOps.videoMeta($c)")
    override protected def withNewChildInternal(newChild: Expression): VideoMeta =
      copy(child = newChild)
    override def prettyName: String = "video_meta"
  }

  /** Integer top-level JSON field extraction
    * ([[HashOps.jsonGetLong]]) — nullable: absent / non-integer /
    * non-object inputs yield null, matching
    * `CAST(get_json_object(...) AS BIGINT)` for integer fields at a
    * fraction of the per-row cost (no Jackson parse). */
  case class JsonGetLong(child: Expression, field: String)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      HashOps.jsonGetLong(input.asInstanceOf[UTF8String], field)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fieldRef = ctx.addReferenceObj("field", field, "java.lang.String")
      val tmp = ctx.freshName("jsonLong")
      nullSafeCodeGen(ctx, ev, c => s"""
        |java.lang.Long $tmp = graft.functions.HashOps.jsonGetLong($c, $fieldRef);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): JsonGetLong =
      copy(child = newChild)
    override def prettyName: String = "json_get_long"
  }

  /** Composite quality score (HashOps.qualityScore). */
  case class QualityScore(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      HashOps.qualityScore(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.qualityScore($c)")
    override protected def withNewChildInternal(newChild: Expression): QualityScore =
      copy(child = newChild)
    override def prettyName: String = "quality_score"
  }

  /** Stopword/char-profile language ID (HashOps.langId). */
  case class LangId(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      HashOps.langId(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.langId($c)")
    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
    override def prettyName: String = "lang_id"
  }

  /** Fused language-ID + quality score (HashOps.langQuality): one
    * text pass producing struct(lang, quality) — componentwise equal
    * to (LangId, QualityScore), which each pay their own pass. */
  case class LangQuality(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("quality", DoubleType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      HashOps.langQuality(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.langQuality($c)")
    override protected def withNewChildInternal(newChild: Expression): LangQuality =
      copy(child = newChild)
    override def prettyName: String = "lang_quality"
  }

  /** Fused `md5(normalizeWs(text))` → 16-byte binary fingerprint
    * (HashOps.md5Normalized): the exact-dedup key without the
    * intermediate normalized string or the 32-byte hex form. */
  case class Md5Normalized(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      HashOps.md5Normalized(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.md5Normalized($c)")
    override protected def withNewChildInternal(newChild: Expression): Md5Normalized =
      copy(child = newChild)
    override def prettyName: String = "md5_normalized"
  }

  /** Distinct n-gram shingle set of a text column → sorted
    * array<string> (HashOps.shingleArray). */
  case class NGramShingles(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n > 0, s"shingle size must be positive, got $n")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.shingleArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.shingleArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NGramShingles =
      copy(child = newChild)
    override def prettyName: String = "ngram_shingles"
  }

  /** Exact n-gram Jaccard of two text columns → double, rounded to 4
    * places (HashOps.ngramJaccard). */
  case class NGramJaccard(left: Expression, right: Expression, n: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    require(n > 0, s"shingle size must be positive, got $n")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.ngramJaccard($a, $b, $n)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): NGramJaccard =
      copy(left = l, right = r)
    override def prettyName: String = "ngram_jaccard"
  }

  /** Exact Jaccard of two sorted distinct array<string> columns
    * (HashOps.sortedJaccard — merge-count, allocation-free). */
  case class SortedJaccard(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.sortedJaccard($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_jaccard"
  }

  /** Sorted distinct array<bigint> of XXH64 n-gram shingle hashes —
    * the near-dup verify stage's shingle-set representation
    * ([[HashOps.shingleHashArray]]). */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n > 0, s"shingle size must be positive, got $n")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashOps.shingleHashArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.shingleHashArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
    override def prettyName: String = "shingle_hashes"
  }

  /** Exact Jaccard of two sorted distinct array<bigint> shingle-hash
    * sets ([[HashOps.sortedJaccardHash]]). */
  case class SortedJaccardHash(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(LongArray, LongArray)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.sortedJaccardHash(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.sortedJaccardHash($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardHash =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_jaccard_hash"
  }

  /** Monotone fixed radix cell of a double ([[HashOps.radixCell]]):
    * top `bits` bits of the sign-corrected IEEE bit pattern, in
    * [0, 2^bits). Cell order is value order for all non-NaN inputs —
    * the bucketing needs no min/max pre-pass, which is what lets the
    * rank-narrowing percentile fuse its stats scan into the first
    * narrowing scan. */
  case class RadixCell(child: Expression, bits: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      HashOps.radixCell(input.asInstanceOf[Double], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashOps.radixCell($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): RadixCell =
      copy(child = newChild)
    override def prettyName: String = "radix_cell"
  }

  /** Fraction of equal components of two array<bigint> signatures. */
  case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(LongArray, LongArray)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashOps.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashOps.sigAgreement($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreement =
      copy(left = l, right = r)
    override def prettyName: String = "sig_agreement"
  }
}

/** Column-level façade over the custom expressions. */
object GraftFunctions {
  private def expr(c: Column) = GraftSqlBridge.expression(c)

  def minhashSig(text: Column, numHashes: Int, shingleSize: Int): Column =
    GraftSqlBridge.column(exprs.MinHashSig(expr(text), numHashes, shingleSize))

  def simhash64(text: Column): Column =
    GraftSqlBridge.column(exprs.SimHash64(expr(text)))

  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.CosineSim(expr(a), expr(b)))

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.DotProduct(expr(a), expr(b)))

  def l2Distance(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.L2Distance(expr(a), expr(b)))

  def cosinePacked(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.CosineSimPacked(expr(a), expr(b)))

  def dotPacked(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.DotProductPacked(expr(a), expr(b)))

  def l2DistancePacked(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.L2DistancePacked(expr(a), expr(b)))

  def packFloats(v: Column): Column =
    GraftSqlBridge.column(exprs.PackFloats(expr(v)))

  def unpackFloats(v: Column): Column =
    GraftSqlBridge.column(exprs.UnpackFloats(expr(v)))

  def lshBucket(vec: Column, numPlanes: Int): Column =
    GraftSqlBridge.column(exprs.LshBucket(expr(vec), numPlanes))

  def lshBuckets(vec: Column, numPlanes: Int, numTables: Int): Column =
    GraftSqlBridge.column(exprs.LshBuckets(expr(vec), numPlanes, numTables))

  def radixCell(v: Column, bits: Int): Column =
    GraftSqlBridge.column(exprs.RadixCell(expr(v), bits))

  def sigAgreement(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.SigAgreement(expr(a), expr(b)))

  def ngramShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(exprs.NGramShingles(expr(text), n))

  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    GraftSqlBridge.column(exprs.NGramJaccard(expr(a), expr(b), n))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.SortedJaccard(expr(a), expr(b)))

  def shingleHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(exprs.ShingleHashes(expr(text), n))

  def sortedJaccardHash(a: Column, b: Column): Column =
    GraftSqlBridge.column(exprs.SortedJaccardHash(expr(a), expr(b)))

  def textStats(text: Column): Column =
    GraftSqlBridge.column(exprs.TextStats(expr(text)))

  def tokenCount(text: Column): Column =
    GraftSqlBridge.column(exprs.TokenCount(expr(text)))

  def normalizeWs(text: Column): Column =
    GraftSqlBridge.column(exprs.NormalizeWs(expr(text)))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(exprs.WinnowFingerprint(expr(text), k, w))

  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(exprs.NearestCell(expr(vec), centroids))

  def nearestCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    GraftSqlBridge.column(exprs.NearestCells(expr(vec), centroids, nprobe))

  def qualityScore(text: Column): Column =
    GraftSqlBridge.column(exprs.QualityScore(expr(text)))

  def repetitionStats(text: Column, delim: String): Column =
    GraftSqlBridge.column(exprs.RepetitionStats(expr(text), delim))

  def langId(text: Column): Column =
    GraftSqlBridge.column(exprs.LangId(expr(text)))

  def langQuality(text: Column): Column =
    GraftSqlBridge.column(exprs.LangQuality(expr(text)))

  def md5Normalized(text: Column): Column =
    GraftSqlBridge.column(exprs.Md5Normalized(expr(text)))

  def jsonGetLong(json: Column, field: String): Column =
    GraftSqlBridge.column(exprs.JsonGetLong(expr(json), field))

  def imageMeta(content: Column): Column =
    GraftSqlBridge.column(exprs.ImageMeta(expr(content)))

  def audioMeta(content: Column): Column =
    GraftSqlBridge.column(exprs.AudioMeta(expr(content)))

  def videoMeta(content: Column): Column =
    GraftSqlBridge.column(exprs.VideoMeta(expr(content)))
}
