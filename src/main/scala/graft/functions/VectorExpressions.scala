package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels (SURVEY.md preference order (b): a custom Catalyst
  * `Expression` beats both a Scala UDF and a mega-expression).
  *
  * A statically-unrolled `Σ element_at(a,i)·element_at(b,i)` compiles
  * hundreds of Janino expression nodes per query (~5 s of fixed codegen
  * cost, measured); the interpreted `aggregate(zip_with(...))` path avoids
  * the compile but pays per-row lambda dispatch. This node generates one
  * tight primitive loop — microseconds to compile, vectorizable at run
  * time, any vector width.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // null ELEMENTS contribute 0 (sparse-vector semantics) — the input types
  // allow containsNull=true, so both paths must guard each slot; reading a
  // null slot unguarded returns garbage from UnsafeArrayData and NPEs from
  // GenericArrayData
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level dot product over two ARRAY<DOUBLE> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column-level nearest-centroid assignment against a BROADCAST centroid
    * set (see [[NearestCentroid]]). */
  def nearestCentroid(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[NearestCentroid.Centroids])
      : Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), bc))

  /** Column-level product-quantization encode against a BROADCAST
    * codebook (see [[PqEncode]]). */
  def pqEncode(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[PqEncode.Codebook]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), bc))

  /** Column-level matrix-vector projection against a BROADCAST weight
    * matrix (see [[MatVecProject]]). */
  def matVecProject(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      scale: Double): Column =
    Bridge.column(MatVecProject(Bridge.expression(v), bc, scale))

  /** Column-level word shingles (see [[WordShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Column-level per-pair chrF counts (see [[ChrFStats]]). */
  def chrfStats(ref: Column, hyp: Column, maxN: Int): Column =
    Bridge.column(ChrFStats(Bridge.expression(ref),
      Bridge.expression(hyp), maxN))

  /** Column-level per-pair BLEU word-n-gram counts (see
    * [[BleuStats]]). */
  def bleuStats(ref: Column, hyp: Column, maxN: Int): Column =
    Bridge.column(BleuStats(Bridge.expression(ref),
      Bridge.expression(hyp), maxN))

  /** Column-level rolling fingerprints (see [[RollingFingerprints]]). */
  def rollingFingerprints(text: Column, k: Int): Column =
    Bridge.column(RollingFingerprints(Bridge.expression(text), k))

  /** Column-level content-defined chunking (see [[CdcChunks]]). */
  def cdcChunks(text: Column, k: Int, portable: Boolean = true): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), k, portable))

  /** Column-level winnowing (see [[WinnowingFingerprints]]). */
  def winnowingFingerprints(text: Column, k: Int, w: Int,
                            portable: Boolean = true): Column =
    Bridge.column(WinnowingFingerprints(Bridge.expression(text), k, w,
      portable))

  /** Column-level unigram entropy (see [[TokenEntropy]]). */
  def tokenEntropy(text: Column): Column =
    Bridge.column(TokenEntropy(Bridge.expression(text)))

  /** Column-level BPE word encode against a BROADCAST merge table (see
    * [[BpeEncodeWord]]). */
  def bpeEncodeWord(word: Column,
      bc: org.apache.spark.broadcast.Broadcast[BpeEncodeWord.Merges])
      : Column =
    Bridge.column(BpeEncodeWord(Bridge.expression(word), bc))

  /** Column-level all-positions k-gram hashes (see [[GramHashes]]). */
  def gramHashes(text: Column, k: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(text), k))

  /** Column-level dominant-script classification (see
    * [[DominantScript]]). */
  def dominantScript(text: Column): Column =
    Bridge.column(DominantScript(Bridge.expression(text)))

  /** Column-level symbol→token-id lookup against a BROADCAST vocab
    * (see [[VocabIds]]). */
  def vocabIds(encoded: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Integer]]): Column =
    Bridge.column(VocabIds(Bridge.expression(encoded), bc))

  /** Column-level symbols→ids with SentencePiece byte_fallback (see
    * [[VocabIdsByteFallback]]). */
  def vocabIdsByteFallback(encoded: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Integer]]): Column =
    Bridge.column(VocabIdsByteFallback(Bridge.expression(encoded), bc))

  /** Column-level OOV-to-byte-piece symbol rewrite (see
    * [[ByteFallbackSymbols]]). */
  def byteFallbackSymbols(encoded: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Integer]]): Column =
    Bridge.column(ByteFallbackSymbols(Bridge.expression(encoded), bc))

  /** Column-level ids→symbols inverse lookup (see [[VocabSymbols]]). */
  def vocabSymbols(ids: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[Integer, String]]): Column =
    Bridge.column(VocabSymbols(Bridge.expression(ids), bc))

  /** Column-level multilingual language-ID (see [[LangIdMulti]]). */
  def langIdMulti(text: Column): Column =
    Bridge.column(LangIdMulti(Bridge.expression(text)))

  /** Column-level GPT-2 byte-level alphabet map (see [[Gpt2Bytes]]). */
  def gpt2Bytes(token: Column): Column =
    Bridge.column(Gpt2Bytes(Bridge.expression(token)))

  /** Column-level inverse byte-level map (see [[Gpt2BytesDecode]]). */
  def gpt2BytesDecode(mapped: Column): Column =
    Bridge.column(Gpt2BytesDecode(Bridge.expression(mapped)))
}

/** Nearest-centroid assignment with the centroid matrix read from a Spark
  * BROADCAST variable instead of k·dim plan literals: at k=4096, dim=256
  * the literal form puts >1M literals in one projection — Janino and plan
  * serialization blow up long before the corpus matters — while this node
  * keeps the plan O(1) in k (the serialized expression carries only the
  * broadcast handle) and ships the matrix once per executor via torrent
  * broadcast. Arithmetic matches the literal path bit-for-bit: per-pair
  * cosine = seqdot(v,c) / (sqrt(seqdot(v,v)) · precomputed ‖c‖), 0 when
  * either norm is 0, null elements skipped ([[DotProduct]] semantics);
  * ties (equal sim) resolve to the smallest cluster id. Returns
  * STRUCT<cluster: BIGINT, sim: DOUBLE>.
  */
case class NearestCentroid(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[NearestCentroid.Centroids])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cluster",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sim", DoubleType,
      nullable = false)))

  override def prettyName: String = "nearest_centroid"

  /** Row kernel — public so generated code can call it. */
  def kernel(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val cs = bc.value
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val x = v.getDouble(i); vv += x * x }
      i += 1
    }
    val nv = math.sqrt(vv)
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var j = 0
    while (j < cs.ids.length) {
      val c = cs.vecs(j)
      val m = math.min(n, c.length)
      var d = 0.0
      i = 0
      while (i < m) {
        if (!v.isNullAt(i)) d += v.getDouble(i) * c(i)
        i += 1
      }
      val nn = nv * cs.norms(j)
      val sim = if (nn > 0) d / nn else 0.0
      val cid = cs.ids(j)
      if (sim > bestSim || (sim == bestSim && cid < bestCid)) {
        bestSim = sim; bestCid = cid
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, bestSim))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroid {
  /** Broadcast payload: parallel arrays of cluster ids, centroid vectors,
    * and precomputed L2 norms (same sequential summation as the runtime
    * dot, so the product ‖v‖·‖c‖ matches the literal path exactly). */
  final case class Centroids(ids: Array[Long], vecs: Array[Array[Double]],
                             norms: Array[Double])

  def build(centroids: Seq[(Long, Array[Double])]): Centroids = {
    val ids = centroids.map(_._1).toArray
    val vecs = centroids.map(_._2).toArray
    val norms = vecs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    Centroids(ids, vecs, norms)
  }
}

/** Matrix-vector projection against a BROADCAST weight matrix:
  * out[j] = (Σ_i v[i] · m[j][i]) · scale, each row-dot accumulated
  * sequentially in index order (bit-identical to the literal-plane
  * [[graft.ml.Similarity.projectExpr]] path, which is the point — the
  * two routes are interchangeable at any outDim). This is the
  * large-outDim route for the JL projection: the plan carries ONE
  * broadcast reference instead of outDim·dim literals, so outDim·dim
  * beyond ~1e5 (where Janino/plan serialization would blow up — the
  * assignToCentroids ceiling of VERDICT r4) costs O(1) plan bytes.
  * Same broadcast shape as [[NearestCentroid]]/[[PqEncode]]. */
case class MatVecProject(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    scale: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mat_vec_project expects ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "mat_vec_project"

  /** Row kernel — public so generated code can call it. */
  def kernel(v: ArrayData): ArrayData = {
    val m = bc.value
    val n = v.numElements()
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      val lim = math.min(n, row.length)
      var s = 0.0
      var i = 0
      while (i < lim) {
        if (!v.isNullAt(i)) s += v.getDouble(i) * row(i)
        i += 1
      }
      out(j) = s * scale
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecProject", this,
      classOf[MatVecProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Product-quantization encode against a BROADCAST codebook: the vector
  * splits into `m` contiguous subspaces and each subspace maps to the
  * index of its nearest (squared-L2) codebook centroid — the classic
  * 8-bytes-per-vector compression ANN serving ships instead of raw
  * floats. One expression node, map-only, plan O(1) in the codebook size
  * (same broadcast shape as [[NearestCentroid]]). Distances accumulate
  * sequentially over each subspace, so an independent sequential oracle
  * computes bit-identical doubles and therefore identical argmins; ties
  * go to the smallest centroid index. Returns ARRAY<INT> of length `m`.
  */
case class PqEncode(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqEncode.Codebook])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  /** Row kernel — public so generated code can call it. */
  def kernel(v: ArrayData): ArrayData = {
    val cb = bc.value
    val m = cb.m; val sub = cb.sub
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var bestI = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < cb.centroids.length) {
        val c = cb.centroids(i)
        var d = 0.0
        var t = 0
        val base = j * sub
        while (t < sub) {
          val idx = base + t
          val x = if (idx < v.numElements() && !v.isNullAt(idx))
            v.getDouble(idx) else 0.0
          val diff = x - c(idx)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; bestI = i } // strict < keeps ties at
                                               // the smallest index
        i += 1
      }
      out(j) = bestI
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  /** Broadcast payload: full-width centroid vectors (subspace j of
    * centroid i is `centroids(i)` at offsets [j·sub, (j+1)·sub)). */
  final case class Codebook(centroids: Array[Array[Double]], m: Int,
                            sub: Int)
}

/** Unigram (whitespace-token) Shannon entropy of a text column in nats —
  * the repetitiveness/diversity signal quality filters cut on (boilerplate
  * and keyword-stuffed pages score low). Native single pass: one token
  * HashMap per row, NO (doc, token) explode/shuffle — the relational form
  * shuffles every token of every document just to count within the row.
  * Tokens are lowercased, empty tokens (split artifacts) skipped; no
  * tokens → 0.0. Accumulation iterates the map in insertion order, which
  * is deterministic per text; cross-engine float agreement is handled by
  * rounding at the query edge like every computed double.
  */
/** Space-separated BPE symbols → token IDS against a vocab read from a
  * Spark BROADCAST variable — the id half of tokenizer application
  * ([[BpeEncodeWord]] produces the symbol string this consumes; the
  * vocab is `tokenizer.json`'s `model.vocab`, read by
  * [[graft.text.TokenizerFiles.readTokenizerJsonVocab]]). A plan-literal
  * map of a 32k-50k-entry vocab would hit the same plan-size ceiling
  * the merge table did, so the table rides one torrent broadcast and
  * the plan carries only the handle. Symbols missing from the vocab map
  * to -1 (the caller decides unk policy — real tokenizers byte-fall-
  * back before this point, so -1 flags a merges/vocab mismatch rather
  * than normal input). Empty input ("" — the null-word contract
  * upstream) returns an EMPTY array, not [-1]: no symbols, no ids. */
case class VocabIds(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, Integer]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vocab_ids expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types
    .ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def prettyName: String = "vocab_ids"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    if (s.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyIntArray)
    val vocab = bc.value
    val syms = s.split(" ", -1)
    val out = new Array[Int](syms.length)
    var i = 0
    while (i < syms.length) {
      val id = vocab.get(syms(i))
      out(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabIds", this,
      classOf[VocabIds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[VocabIds]] under SentencePiece/Llama `byte_fallback` semantics:
  * a symbol absent from the vocab expands to its UTF-8 bytes' piece
  * forms (`<0x61>`-style, uppercase hex — the published piece
  * spelling), each looked up in the SAME vocab; a byte piece the
  * vocab lacks still maps to -1 (a byte_fallback vocab carries all
  * 256 by construction, so -1 flags a malformed vocab rather than
  * exotic text). The output id sequence can be LONGER than the
  * symbol count — exactly how a real Llama tokenizer prices text
  * outside its merge alphabet instead of emitting unk. */
case class VocabIdsByteFallback(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, Integer]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vocab_ids_byte_fallback expects STRING, " +
          s"got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types
    .ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def prettyName: String = "vocab_ids_byte_fallback"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    if (s.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyIntArray)
    val vocab = bc.value
    val syms = s.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Int](syms.length)
    var i = 0
    while (i < syms.length) {
      val id = vocab.get(syms(i))
      if (id != null) out += id.intValue()
      else {
        val bytes = syms(i).getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
        var j = 0
        while (j < bytes.length) {
          val bid = vocab.get(f"<0x${bytes(j) & 0xff}%02X>")
          out += (if (bid == null) -1 else bid.intValue())
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabIdsBf", this,
      classOf[VocabIdsByteFallback].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The SYMBOL-level face of [[VocabIdsByteFallback]]: a space-joined
  * symbol string with every vocab MISS rewritten to its UTF-8 bytes'
  * `<0xXX>` piece spellings — exactly the piece stream a real
  * byte_fallback tokenizer emits, so downstream counting
  * (`size(split(_, " "))`) and id lookup both price OOV text
  * byte-accurately without special cases. Hits pass through
  * verbatim. */
case class ByteFallbackSymbols(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, Integer]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"byte_fallback_symbols expects STRING, " +
          s"got ${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType

  override def prettyName: String = "byte_fallback_symbols"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = input.toString
    if (s.isEmpty) return input
    val vocab = bc.value
    val syms = s.split(" ", -1)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < syms.length) {
      if (i > 0) sb.append(' ')
      if (vocab.containsKey(syms(i))) sb.append(syms(i))
      else {
        val bytes = syms(i).getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
        var j = 0
        while (j < bytes.length) {
          if (j > 0) sb.append(' ')
          sb.append(f"<0x${bytes(j) & 0xff}%02X>")
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteFallbackSyms", this,
      classOf[ByteFallbackSymbols].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Inverse of [[VocabIds]] — token ids back to their symbols,
  * CONCATENATED (the detokenizer's first half; for the byte-level
  * family [[Gpt2BytesDecode]] then maps the byte-form alphabet back to
  * text, `Ġ` becoming the space again). An id absent from the vocab
  * fails descriptively: it cannot have come from this vocab, and
  * silently skipping it would yield text that LOOKS decoded and is
  * missing content. Broadcast-backed like the forward map — the plan
  * is O(1) in vocab size. */
case class VocabSymbols(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[Integer, String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vocab_symbols expects ARRAY<INT>, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "vocab_symbols"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.unsafe.types.UTF8String = {
    val inv = bc.value
    val n = input.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val id = input.getInt(i)
      val sym = inv.get(Integer.valueOf(id))
      if (sym == null) throw new IllegalArgumentException(
        s"vocab_symbols: id $id is not in the vocabulary")
      sb.append(sym)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabSymbols", this,
      classOf[VocabSymbols].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Dominant Unicode script of a string — the per-row routing signal of
  * every script-dispatched operator ([[graft.text.TextOps]]
  * `dominantScriptExpr`), as ONE pass of code-point range checks
  * instead of five whole-text `regexp_replace` strip-and-measure
  * passes (each of which also materializes a stripped copy; measured
  * 3.7x on the q277 shingle path). Semantics are IDENTICAL to the
  * regex form and the oracles' CASE chain: counts per
  * [[graft.text.TextOps.ScriptRanges]] class — latin A-Za-z À(U+00C0)-
  * ɏ(U+024F), cyrillic U+0400-U+04FF, cjk kana U+3040-U+30FF + han
  * U+4E00-U+9FFF + hangul U+AC00-U+D7AF, arabic U+0600-U+06FF, digit
  * 0-9 (all-BMP classes, so code-point counts equal the regex's
  * character counts) — highest count wins, ties in ScriptRanges order,
  * "none" when all zero. */
case class DominantScript(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dominant_script expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "dominant_script"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = input.toString
    var latin = 0L; var cyrillic = 0L; var cjk = 0L
    var arabic = 0L; var digit = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0x24F)) latin += 1
      else if (cp >= 0x400 && cp <= 0x4FF) cyrillic += 1
      else if ((cp >= 0x3040 && cp <= 0x30FF) ||
          (cp >= 0x4E00 && cp <= 0x9FFF) ||
          (cp >= 0xAC00 && cp <= 0xD7AF)) cjk += 1
      else if (cp >= 0x600 && cp <= 0x6FF) arabic += 1
      else if (cp >= '0' && cp <= '9') digit += 1
    }
    // tie-break = ScriptRanges order (latin, cyrillic, cjk, arabic,
    // digit) — the first class reaching the max wins, like the oracle's
    // CASE chain
    val mx = math.max(latin, math.max(cyrillic,
      math.max(cjk, math.max(arabic, digit))))
    val name =
      if (mx == 0L) "none"
      else if (latin == mx) "latin"
      else if (cyrillic == mx) "cyrillic"
      else if (cjk == mx) "cjk"
      else if (arabic == mx) "arabic"
      else "digit"
    org.apache.spark.unsafe.types.UTF8String.fromString(name)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dominantScript", this,
      classOf[DominantScript].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MULTILINGUAL language-ID router — the multi-class sibling of
  * [[graft.text.TextOps.langIdEn]]'s English-only stopword gate and
  * [[DominantScript]]'s script dispatch: per-language character-n-gram
  * profiles (the public TextCat / CLD-style approach — each language a
  * short weighted list of its most distinctive character 1-5-grams,
  * accents and script characters included) scored in ONE pass over the
  * space-padded lowercased text. score(l) = Σ w·occurrences(gram);
  * winner = max score with profile order breaking ties; all-zero →
  * "und". Returns STRUCT(lang STRING, score LONG) — the score is an
  * exact integer, so the whole verdict is engine-portable: an oracle
  * replays occurrences as the `(len(t) - len(replace(t, g, ''))) /
  * len(g)` length-delta. That replay counts NON-overlapping matches,
  * so every multi-char profile gram is required BORDERLESS (no proper
  * prefix equal to a suffix — validated at class load): a borderless
  * gram cannot overlap itself, making the kernel's every-position scan
  * and the oracle's replace-count provably equal. ~12 high-volume
  * languages; the profile table is an operator CONSTANT (a few hundred
  * bytes — compiled in, no broadcast needed). Routing signal for
  * per-language curation and temperature mixing, not a replacement for
  * a trained classifier. */
case class LangIdMulti(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lang_id_multi expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = false)))

  override def prettyName: String = "lang_id_multi"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val t = " " + input.toLowerCase.toString + " "
    val scores = new Array[Long](LangIdMulti.langs.length)
    val n = t.length
    var i = 0
    while (i < n) {
      var len = 1
      while (len <= LangIdMulti.maxGramLen && i + len <= n) {
        val hit = LangIdMulti.lookup.get(t.substring(i, i + len))
        if (hit != null) {
          var j = 0
          while (j < hit.length) {
            scores(hit(j)) += hit(j + 1); j += 2
          }
        }
        len += 1
      }
      i += 1
    }
    var best = 0
    var i2 = 1
    while (i2 < scores.length) {
      if (scores(i2) > scores(best)) best = i2
      i2 += 1
    }
    val (lang, score) =
      if (scores(best) <= 0L) ("und", 0L)
      else (LangIdMulti.langs(best), scores(best))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(lang),
        score))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdMulti", this,
      classOf[LangIdMulti].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LangIdMulti {
  /** The profile table — an operator constant, order = tie-break
    * priority. Grams are drawn from public frequency knowledge (the
    * TextCat corpus-profile tradition): function-word fragments for
    * the Latin-script languages, distinctive single characters and
    * particles for the script-separated ones. Weights 1-3 by
    * distinctiveness. EVERY multi-char gram must be borderless — see
    * the class doc; the require below fails the build of any future
    * edit that violates it. */
  val Profiles: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq(" th" -> 3, "the" -> 3, "nd " -> 2, " of" -> 2,
      "ing" -> 2, "ion" -> 1, " wa" -> 1),
    "de" -> Seq("und" -> 3, "der" -> 2, "ich" -> 2, "sch" -> 2,
      "ein" -> 2, "die" -> 2, "ung" -> 1),
    "fr" -> Seq(" le" -> 2, "les" -> 2, "ent" -> 2, "que" -> 2,
      " et" -> 2, "eur" -> 1, "ais" -> 1),
    "es" -> Seq("ción" -> 3, " el" -> 2, "los" -> 2, "ñ" -> 2,
      "ado" -> 1, "í" -> 1),
    "pt" -> Seq("ção" -> 3, "ã" -> 2, "ões" -> 2, " em" -> 1,
      "lh" -> 1),
    "it" -> Seq("zione" -> 3, "gli" -> 2, "è" -> 2, " di" -> 1,
      "ano" -> 1),
    "nl" -> Seq("ij" -> 2, "het" -> 2, "van" -> 2, "een" -> 1,
      "sch" -> 1),
    "ru" -> Seq("что" -> 2, "о" -> 1, "е" -> 1, "и" -> 1, "н" -> 1,
      "т" -> 1),
    "ar" -> Seq("ال" -> 2, "في" -> 2, "ة" -> 2, "من" -> 1, "ي" -> 1),
    "zh" -> Seq("的" -> 3, "是" -> 2, "了" -> 2, "在" -> 1, "一" -> 1),
    "ja" -> Seq("の" -> 3, "を" -> 3, "に" -> 2, "は" -> 2,
      "です" -> 2, "た" -> 1),
    "ko" -> Seq("이" -> 2, "다" -> 2, "는" -> 2, "의" -> 2, "하" -> 1))

  private def borderless(g: String): Boolean =
    (1 until g.length).forall(b =>
      g.substring(0, b) != g.substring(g.length - b))

  Profiles.foreach { case (l, gs) =>
    gs.foreach { case (g, w) =>
      require(g.nonEmpty && w > 0, s"$l: empty gram or weight")
      require(borderless(g),
        s"$l profile gram '$g' has a border — overlapping-scan and " +
          "replace-count semantics would diverge (oracle parity)")
    }
  }

  private[functions] val langs: Array[String] = Profiles.map(_._1).toArray

  private[functions] val maxGramLen: Int =
    Profiles.flatMap(_._2.map(_._1.length)).max

  /** gram → flattened (langIdx, weight) pairs. */
  private[functions] val lookup
      : java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    Profiles.zipWithIndex.foreach { case ((_, gs), li) =>
      gs.foreach { case (g, w) =>
        val prev = m.get(g)
        m.put(g,
          if (prev == null) Array(li, w) else prev ++ Array(li, w))
      }
    }
    m
  }
}

case class TokenEntropy(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_entropy expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): Double = {
    val toks = input.toLowerCase.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var n = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        counts.merge(t, 1L, (a, b) => a + b)
        n += 1
      }
      i += 1
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * math.log(p)
    }
    0.0 - acc // 0.0 - x, not -x: keeps the single-token case at +0.0
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenEntropy", this,
      classOf[TokenEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Content-defined rolling-hash fingerprints: md5 of every character
  * k-gram, keeping only hashes starting with '0' (1/16 content-defined
  * sample); empty sample → one whole-text hash. Native single pass — the
  * `transform(sequence…)` composition materializes one 32-char hex string
  * per character position (~60× the text size) before filtering, which
  * OOMs on curation-scale documents.
  */
case class RollingFingerprints(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, "k-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprints expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toString
    val md = MinHashParams.threadMd5() // per-row getInstance pays a JCA
                                       // provider lookup on the hot path
    val n = math.max(text.length - (k - 1), 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val h = md5Hex(md, text.substring(i, math.min(i + k, text.length)))
      if (h.charAt(0) == '0') {
        out += org.apache.spark.unsafe.types.UTF8String.fromString(h)
      }
      i += 1
    }
    if (out.isEmpty) {
      out += org.apache.spark.unsafe.types.UTF8String
        .fromString(md5Hex(md, text))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingFp", this,
      classOf[RollingFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** WINNOWING fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
  * algorithm): hash every character k-gram, then in every window of `w`
  * consecutive k-gram hashes select the minimum (ties → RIGHTMOST, the
  * paper's rule), and emit the distinct selected (pos, hash)
  * pairs in position order. Unlike [[RollingFingerprints]]' mod-p
  * sampling (expected 1/16 rate but NO spacing guarantee — a run can go
  * unsampled arbitrarily long), winnowing GUARANTEES that any shared
  * substring of length ≥ w + k − 1 contributes at least one shared
  * fingerprint — the detection-floor property plagiarism/overlap
  * pipelines cite. Hashes are the full md5 hex of the k-gram (the
  * portable convention, lexicographic hex order = selection order);
  * texts shorter than k hash whole. Single pass per row, O(n·w)
  * comparisons over precomputed hashes, map-only.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int,
                                 portable: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, "k-gram width must be >= 1")
  require(w >= 1, "window width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnowing_fingerprints expects STRING, got ${other.simpleString}")
    }

  // portable mode carries the md5 hex (replayable by any engine); the
  // internal mode carries the raw xxhash64 LONG — ~5x less hashing work
  // per input byte and an 8-byte key instead of a 32-char string
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("fp",
        if (portable) org.apache.spark.sql.types.StringType
        else org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Row kernel — public so generated code can call it. Selection runs
    * over an ORDER ABSTRACTION shared by both hash modes: md5-hex
    * lexicographic order IS unsigned numeric order of the 128-bit
    * digest, and the xxhash64 mode compares unsigned 64-bit — so the
    * rightmost-min rule and the w+k-1 detection guarantee are mode-
    * independent (the selection POSITIONS differ per mode, the
    * guarantee does not; PropertySpec asserts it for both). */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toString
    val n = math.max(text.length - (k - 1), 1)
    val selected = scala.collection.mutable.LinkedHashSet.empty[Int]
    val nWin = math.max(n - w + 1, 1)
    var strHashes: Array[String] = null
    var longHashes: Array[Long] = null
    if (portable) {
      val md = MinHashParams.threadMd5()
      strHashes = new Array[String](n)
      var i = 0
      while (i < n) {
        strHashes(i) = md5Hex(md,
          text.substring(i, math.min(i + k, text.length)))
        i += 1
      }
    } else {
      longHashes = new Array[Long](n)
      var i = 0
      while (i < n) {
        val b = text.substring(i, math.min(i + k, text.length))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        longHashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform
            .BYTE_ARRAY_OFFSET, b.length, 42L)
        i += 1
      }
    }
    @inline def leq(p: Int, q: Int): Boolean =
      if (portable) strHashes(p).compareTo(strHashes(q)) <= 0
      else java.lang.Long.compareUnsigned(longHashes(p),
        longHashes(q)) <= 0
    var j = 0
    while (j < nWin) {
      val end = math.min(j + w, n)
      var best = j
      var p = j + 1
      while (p < end) {
        // <= : rightmost occurrence of the minimum wins
        if (leq(p, best)) best = p
        p += 1
      }
      selected += best
      j += 1
    }
    val rows = selected.toArray.sorted.map { p2 =>
      org.apache.spark.sql.catalyst.InternalRow(p2 + 1,
        if (portable)
          org.apache.spark.unsafe.types.UTF8String
            .fromString(strHashes(p2))
        else java.lang.Long.valueOf(longHashes(p2)))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFp", this,
      classOf[WinnowingFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Content-defined chunking (the FastCDC/rsync boundary idea with a
  * PORTABLE boundary rule): split the text AFTER every position whose
  * trailing character k-gram md5 starts with hex '0' (1/16 rate →
  * expected ~16-char chunks). Boundaries depend only on local CONTENT,
  * never on absolute position — so a passage shifted by an inserted
  * prefix re-aligns to identical chunks after at most one boundary
  * interval, the property fixed-stride chunking fundamentally lacks
  * (any offset < chunkLen shifts EVERY stride chunk). Texts shorter
  * than k (or with no boundary) come back as one whole-text chunk;
  * chunks concatenate back to the input verbatim. Same per-position
  * md5 cost class as [[RollingFingerprints]]; single pass, map-only.
  */
case class CdcChunks(child: Expression, k: Int, portable: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, "k-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Row kernel — public so generated code can call it. Both modes cut
    * at the same 1/16 expected rate: portable tests the md5 hex's first
    * nibble, the xxhash64 mode tests the hash's LOW nibble — boundary
    * positions differ per mode, the content-defined realignment
    * property does not (PropertySpec asserts it for both). */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toString
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n == 0) return new org.apache.spark.sql.catalyst.util
      .GenericArrayData(out.toArray)
    val md = if (portable) MinHashParams.threadMd5() else null
    @inline def isBoundary(from: Int, to: Int): Boolean =
      if (portable) md5Hex(md, text.substring(from, to)).charAt(0) == '0'
      else {
        val b = text.substring(from, to)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform
            .BYTE_ARRAY_OFFSET, b.length, 42L) & 0xfL) == 0L
      }
    var start = 0
    var i = k // 0-based end-exclusive position of the first full k-gram
    while (i <= n) {
      if (isBoundary(i - k, i)) {
        out += org.apache.spark.unsafe.types.UTF8String
          .fromString(text.substring(start, i))
        start = i
      }
      i += 1
    }
    if (start < n) {
      out += org.apache.spark.unsafe.types.UTF8String
        .fromString(text.substring(start, n))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this,
      classOf[CdcChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct lowercase word n-gram shingles of a text column, in first-
  * occurrence order — the native form of
  * `array_distinct(transform(sequence(...), i → concat_ws(" ",
  * slice(split(lower(text)," "), i, n))))`, whose lambda tree costs seconds
  * of fixed codegen per query and re-slices per position. Single pass,
  * exact same output (single-space split keeping empties; < n tokens →
  * one whole-text shingle). Codegen calls the JVM kernel via a reference
  * object so the enclosing stage stays in WholeStageCodegen.
  */
/** Per-pair chrF statistics — ARRAY<STRUCT<n INT, o LONG, r LONG,
  * h LONG>> for n = 1..maxN: multiset char n-gram overlap, ref total,
  * hyp total. chrF counting is strictly per (ref, hyp) pair, so doing it
  * IN-ROW removes the gram explode and every shuffle from the op — the
  * whole metric becomes one map-side projection (measured: the exploded
  * form cost ~7-15 s at sf0.1; this kernel makes it sub-second).
  * Grams index by UTF-16 units like [[CharGrams]]. */
case class ChrFStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 16, "maxN out of range")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(
      _.dataType == org.apache.spark.sql.types.StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chrf_stats expects STRING inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("o",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  /** Row kernel — public so generated code can call it. */
  def kernel(rsU: org.apache.spark.unsafe.types.UTF8String,
             hsU: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val rs = rsU.toString
    val hs = hsU.toString
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      // boxed values so the miss sentinel is a REAL null (a primitive
      // Long value type would unbox a missing key to 0L and make the
      // null guards dead code)
      val m = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i + n <= rs.length) {
        val g = rs.substring(i, i + n)
        val c = m.get(g)
        m.put(g, if (c == null) 1L else c.longValue + 1L)
        i += 1
      }
      var o = 0L
      i = 0
      while (i + n <= hs.length) {
        val g = hs.substring(i, i + n)
        val c = m.get(g)
        if (c != null && c.longValue > 0L) {
          o += 1L; m.put(g, c.longValue - 1L)
        }
        i += 1
      }
      out(n - 1) = org.apache.spark.sql.catalyst.InternalRow(n, o,
        math.max(rs.length - n + 1, 0).toLong,
        math.max(hs.length - n + 1, 0).toLong)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chrfStats", this,
      classOf[ChrFStats].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-pair BLEU statistics — ARRAY<STRUCT<n INT, o LONG, r LONG,
  * h LONG>> for n = 1..maxN over WORD n-grams: o = clipped matches
  * (Σ_g min(count_hyp(g), count_ref(g)) — the Papineni et al. 2002
  * modified precision numerator, via the same decrement-map walk
  * [[ChrFStats]] uses for chars), r / h = ref / hyp n-gram totals
  * (level 1 carries the word lengths the brevity penalty needs).
  * BLEU counting never crosses pairs, so the whole statistic is ONE
  * map-side projection — no gram explode, no shuffle (the ChrFStats
  * argument, replayed for words). Tokens are maximal runs of
  * non-whitespace (ASCII `\s`, the engines' shared `\s` set); case
  * folding is the caller's choice upstream. */
case class BleuStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 16, "maxN out of range")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(
      _.dataType == org.apache.spark.sql.types.StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bleu_stats expects STRING inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("o",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "bleu_stats"

  private def toks(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty[String]
    else BleuStats.Ws.split(t)
  }

  /** Row kernel — public so generated code can call it. */
  def kernel(rsU: org.apache.spark.unsafe.types.UTF8String,
             hsU: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val rw = toks(rsU.toString)
    val hw = toks(hsU.toString)
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      // boxed values: the miss sentinel must be a REAL null (the
      // ChrFStats convention)
      val m = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i + n <= rw.length) {
        val g = BleuStats.gram(rw, i, n)
        val c = m.get(g)
        m.put(g, if (c == null) 1L else c.longValue + 1L)
        i += 1
      }
      var o = 0L
      i = 0
      while (i + n <= hw.length) {
        val g = BleuStats.gram(hw, i, n)
        val c = m.get(g)
        if (c != null && c.longValue > 0L) {
          o += 1L; m.put(g, c.longValue - 1L)
        }
        i += 1
      }
      out(n - 1) = org.apache.spark.sql.catalyst.InternalRow(n, o,
        math.max(rw.length - n + 1, 0).toLong,
        math.max(hw.length - n + 1, 0).toLong)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bleuStats", this,
      classOf[BleuStats].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BleuStats {
  private[functions] val Ws = java.util.regex.Pattern.compile("\\s+")

  /** tokens i..i+n-1 joined on ' ' — tokens are whitespace-free by
    * construction, so the join is collision-free. */
  private[functions] def gram(w: Array[String], i: Int, n: Int): String = {
    if (n == 1) return w(i)
    val sb = new java.lang.StringBuilder
    var j = i
    while (j < i + n) {
      if (j > i) sb.append(' ')
      sb.append(w(j))
      j += 1
    }
    sb.toString
  }
}

case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toLowerCase.toString
    val toks = text.split(" ", -1)
    val out =
      if (toks.length >= n) {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        val sb = new java.lang.StringBuilder()
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) {
          arr(k) = org.apache.spark.unsafe.types.UTF8String
            .fromString(it.next())
          k += 1
        }
        arr
      } else {
        Array[Any](org.apache.spark.unsafe.types.UTF8String
          .fromString(toks.mkString(" ")))
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this,
      classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BPE word encode with the merge table read from a Spark BROADCAST
  * variable instead of |merges| plan literals: the literal fold
  * ([[graft.text.TextOps.bpeEncodeWord]]) chains one `replace` node per
  * merge — a real 32k-64k-merge tokenizer table would put tens of
  * thousands of nested expression nodes in one projection and blow up
  * analysis/codegen long before the corpus matters — while this node
  * keeps the plan O(1) in |merges| (the serialized expression carries
  * only the broadcast handle) and ships the table once per executor.
  *
  * Semantics are IDENTICAL to the literal fold (parity-spec-gated): the
  * word splits into per-code-point symbols, then each merge `(a, b)` in
  * rank order rewrites every greedy left-to-right occurrence of the
  * adjacent symbol pair into `a+b` before the next merge applies; the
  * merged symbol never re-matches within its own pass (Sennrich BPE —
  * pairs (1,2),(3,4) in a run, odd tail untouched). The one divergence:
  * the literal path's `(.)` char split skips line-terminator characters
  * (regex `.` semantics), this kernel splits them too — unreachable
  * through [[graft.text.TextOps.wsTokens]] words, which is the only
  * shipped producer. Returns the space-separated symbol string.
  *
  * Cost per word is O(len^2) symbol-pair lookups and INDEPENDENT of
  * |merges|: instead of folding all |merges| passes (almost all no-ops),
  * the kernel repeatedly finds the minimum-rank pair PRESENT in the word
  * above the last applied rank and applies that one pass. Equivalence to
  * the full fold is an induction: between two applied ranks the fold's
  * state cannot change (a pass with its pair absent is a no-op, and an
  * unchanged state never acquires new pairs), so both walk the same
  * strictly-increasing applied-rank sequence over the same states. */
case class BpeEncodeWord(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[BpeEncodeWord.Merges])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_word expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "bpe_encode_word"

  /** Row kernel — public so generated code can call it. */
  def kernel(wU: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val word = wU.toString
    val m = bc.value
    val n0 = word.codePointCount(0, word.length)
    if (n0 <= 1) return wU // 0/1 symbols: no pair can ever form
    val syms = new Array[String](n0)
    var i = 0
    var k = 0
    while (i < word.length) {
      val step = Character.charCount(word.codePointAt(i))
      syms(k) = word.substring(i, i + step)
      i += step
      k += 1
    }
    var n = n0
    var floor = -1
    var done = false
    while (!done && n > 1) {
      // minimum-rank pair present above the last applied rank
      var best = Int.MaxValue
      var p = 0
      while (p < n - 1) {
        val r = m.rankAfter(syms(p), syms(p + 1), floor)
        if (r >= 0 && r < best) best = r
        p += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one greedy left-to-right pass for merge `best`, in place
        val a = m.lhs(best)
        val b = m.rhs(best)
        val ab = m.merged(best)
        var rd = 0
        var wr = 0
        while (rd < n) {
          if (rd + 1 < n && syms(rd) == a && syms(rd + 1) == b) {
            syms(wr) = ab; rd += 2
          } else { syms(wr) = syms(rd); rd += 1 }
          wr += 1
        }
        n = wr
        floor = best
      }
    }
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(syms(j))
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeWord", this,
      classOf[BpeEncodeWord].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncodeWord {
  /** Broadcast payload: parallel rank-indexed arrays plus a pair-keyed
    * sorted rank-list index ("a b" keys are unambiguous — symbols are
    * space-free by construction). A duplicate (a, b) entry keeps BOTH
    * ranks so a pair recreated after its first merge still matches the
    * later rank, exactly as the literal fold would. */
  final case class Merges(lhs: Array[String], rhs: Array[String],
      merged: Array[String],
      ranks: java.util.HashMap[String, Array[Int]]) {
    /** Smallest rank of pair (a, b) strictly above `floor`, -1 if none. */
    def rankAfter(a: String, b: String, floor: Int): Int = {
      val arr = ranks.get(a + " " + b)
      if (arr == null) -1
      else {
        var i = 0
        while (i < arr.length && arr(i) <= floor) i += 1
        if (i < arr.length) arr(i) else -1
      }
    }
  }

  def build(merges: Seq[(String, String)]): Merges = {
    require(merges.nonEmpty, "merge list must not be empty")
    require(merges.forall { case (a, b) =>
      !a.contains(" ") && !b.contains(" ") && a.nonEmpty && b.nonEmpty },
      "merge symbols must be non-empty and space-free")
    val lhs = merges.map(_._1).toArray
    val rhs = merges.map(_._2).toArray
    val merged = merges.map { case (a, b) => a + b }.toArray
    val ranks = new java.util.HashMap[String, Array[Int]]()
    var i = 0
    while (i < lhs.length) {
      val key = lhs(i) + " " + rhs(i)
      val prev = ranks.get(key)
      ranks.put(key,
        if (prev == null) Array(i) else prev :+ i) // insertion = rank order
      i += 1
    }
    Merges(lhs, rhs, merged, ranks)
  }
}

/** ALL-POSITIONS character k-gram hashes — the sufficient statistic of
  * the EXACT-substring guarantee (Lee et al. 2022 ExactSubstr): two
  * documents share a substring of length ≥ k iff they share at least
  * one aligned k-gram, so emitting EVERY position's gram hash (unlike
  * [[RollingFingerprints]]' 1/16 content-defined sample or
  * [[WinnowingFingerprints]]' window minima, which trade the guarantee
  * for volume) turns exact any-offset substring mining into one
  * digest-keyed equi-join. Returns ARRAY<LONG> with hash_i for the gram
  * starting at position i (positions via posexplode) — 60-bit values
  * from the first 15 hex chars of md5, the SimHash portable-long trick,
  * bit-identical to DuckDB's `('0x' || substr(md5(gram), 1, 15))::
  * BIGINT` on BMP text (both engines substring by the same units
  * there; the corpus and oracles are ASCII). Texts shorter than k
  * return an EMPTY array — a doc with no k-gram can share no k-span
  * (deliberately NOT the whole-text fallback of the sampling kernels).
  * Cost: one md5 per character position — 8 output bytes per input
  * char; the honest price of exactness (the suffix-array reference
  * implementation also touches every byte). */
/** GPT-2 byte-level alphabet map — the public `bytes_to_unicode`
  * bijection every byte-level BPE tokenizer (GPT-2, RoBERTa, CLIP,
  * tokenizers' ByteLevel pre_tokenizer) applies between pre-tokens and
  * merge symbols: the pre-token's UTF-8 BYTES each become one printable
  * BMP character — bytes 33-126, 161-172, 174-255 map to themselves,
  * the 68 others (controls, space, DEL, NBSP range, soft hyphen) to
  * 256+n in exclusion order, so a leading space renders as `Ġ`
  * (U+0120), newline as `Ċ`, tab as `ĉ`. Merge tables shipped as
  * `merges.txt`/`tokenizer.json` are written IN this alphabet
  * ([[graft.text.TokenizerFiles]] passes the forms through verbatim);
  * applying them to raw whitespace-split words can never match the
  * `Ġ`-forms — this node is the missing front half. One pass over the
  * token's bytes, output chars all BMP; codegen'd, map-only.
  * Reference corpus: /root/reference has no tokenizer surface — the
  * mapping is from the public GPT-2 encoder and the HuggingFace
  * tokenizers ByteLevel source. */
case class Gpt2Bytes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gpt2_bytes expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "gpt2_bytes"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val bytes = input.getBytes
    val map = Gpt2Bytes.byteToChar
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(map(bytes(i) & 0xff))
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gpt2Bytes", this,
      classOf[Gpt2Bytes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Gpt2Bytes {
  /** byte value → printable BMP char, the GPT-2 bytes_to_unicode
    * table: printables (minus the 161-172/174-255 carve-outs' gaps)
    * are identity, the 68 excluded bytes take 256+n in ascending byte
    * order. Max mapped code point is 256+67 = 0x143 — all BMP. */
  val byteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
          (b >= 174 && b <= 255)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** Inverse: mapped char → original byte, -1 for chars outside the
    * 256-char alphabet (never produced by [[byteToChar]]). */
  val charToByte: Array[Int] = {
    val inv = Array.fill(0x144)(-1)
    var b = 0
    while (b < 256) { inv(byteToChar(b)) = b; b += 1 }
    inv
  }
}

/** Inverse of [[Gpt2Bytes]] — mapped byte-form text (symbols joined
  * WITHOUT separators: the alphabet never contains a raw space, so the
  * caller strips the symbol-separating spaces first) back to the
  * original string, the detokenizer's last step. A character outside
  * the 256-char alphabet fails descriptively — it cannot have come
  * from [[Gpt2Bytes]]. */
case class Gpt2BytesDecode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gpt2_bytes_decode expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "gpt2_bytes_decode"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = input.toString
    val inv = Gpt2Bytes.charToByte
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c < inv.length) inv(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"gpt2_bytes_decode: char U+${Integer.toHexString(c)} is not " +
          "in the byte-level alphabet")
      out(i) = b.toByte
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gpt2BytesDecode", this,
      classOf[Gpt2BytesDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class GramHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, "k-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toString
    val n = text.length - (k - 1)
    if (n <= 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    }
    val md = MinHashParams.threadMd5()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val d = md.digest(text.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the digest
      var h = 0L
      var j = 0
      while (j < 8) {
        h = (h << 8) | (d(j) & 0xffL)
        j += 1
      }
      out(i) = h >>> 4 // 64 -> 60 bits (drop the 16th hex char)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this,
      classOf[GramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
