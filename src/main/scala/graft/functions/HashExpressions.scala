package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared seed schedule for the MinHash family: deterministic splitmix64
  * constants so signatures are reproducible across runs and executors (no
  * RNG state to ship to 1000 executors). Kept identical to the former
  * explode→groupBy formulation so signatures are stable across engine
  * versions.
  */
private[graft] object MinHashParams {
  /** 2^31 − 1 (Mersenne prime) — the universal-hash modulus. */
  val P = 2147483647L

  /** Affine per-hash params h_k(x) = (a_k·x + b_k) mod P. */
  def hashParams(k: Int): (Long, Long) = {
    var s = k.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    s ^= s >>> 31; s *= 0x94D049BB133111EBL; s ^= s >>> 27
    val a = (s & 0x7FFFFFFFL) | 1L
    val b = (s >>> 33) % P
    (a, b)
  }

  /** Matches Spark SQL `xxhash64(s)` (seed 42). */
  def shingleHash64(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)

  /** Portable 60-bit shingle hash: the first 15 hex digits of md5(s) as a
    * long — exactly `('0x' || substr(md5(s),1,15))::BIGINT` in DuckDB /
    * `conv(substr(md5(s),1,15),16,10)` in Spark SQL, so signatures built
    * on it are reproducible (and strictly verifiable) in any engine with
    * md5. ~2× the cost of xxhash64 — use for verification surfaces;
    * default production hashing stays xxhash64. */
  def shingleHashPortable(md: java.security.MessageDigest,
                          s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  private val localMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-thread reusable digest — MessageDigest is stateful and not
    * thread-safe, and a per-row getInstance pays a JCA provider lookup on
    * the hot path. */
  def threadMd5(): java.security.MessageDigest = localMd5.get()
}

/** MinHash signature of a shingle set in one pass per row: for each of
  * `numHashes` universal hashes h_k, the minimum of h_k over the row's
  * shingles. Output is exactly what the explode→groupBy(64 min-aggs)
  * formulation produced — but as a map-only projection: no row explosion
  * (~10^2-10^3 shingles/doc), no shuffle, and the downstream LSH band join
  * shuffles one signature row per document instead of one row per shingle.
  * At 100 TB that is the difference between shuffling the corpus's shingle
  * multiset and shuffling |docs|·64 longs.
  *
  * Per shingle: h = pmod(xxhash64(shingle), P); per k: pmod(a_k·h + b_k, P)
  * (h < P < 2^31 and a_k < 2^31, so a_k·h + b_k < 2^63 — no overflow).
  * Codegen emits a call to the JVM kernel via a reference object — the
  * loop itself gains nothing from generation, but a CodegenFallback would
  * evict the whole enclosing stage from WholeStageCodegen.
  */
case class MinHashSignature(child: Expression, numHashes: Int,
                            portable: Boolean = false)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  // per-instance hash schedule, built once (not per row); immutable → safe
  // to share across threads
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashParams.hashParams(k)._1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashParams.hashParams(k)._2)

  /** Row kernel — public so generated code can call it. */
  def kernel(shinglesRaw: ArrayData): ArrayData = {
    import MinHashParams._
    val shingles = shinglesRaw
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = if (portable) threadMd5() else null
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = java.lang.Math.floorMod(
          if (portable) shingleHashPortable(md, shingles.getUTF8String(i))
          else shingleHash64(shingles.getUTF8String(i)), P)
        var k = 0
        while (k < numHashes) {
          val v = java.lang.Math.floorMod(as(k) * h + bs(k), P)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash fingerprint of a shingle set in one pass per row: bit i
  * of the output is the sign of Σ_shingles(±1 per xxhash64 bit i). Output
  * matches the former explode→groupBy(64 sum-aggs) formulation; same
  * map-only-projection scale argument as [[MinHashSignature]].
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

  /** Portable mode uses the 60-bit md5-prefix hash, so the fingerprint
    * occupies bits 0..59 (always non-negative). */
  val bits: Int = if (portable) 60 else 64

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  /** Row kernel — public so generated code can call it. */
  def kernel(shingles: ArrayData): Long = {
    import MinHashParams._
    val n = shingles.numElements()
    val counts = new Array[Long](bits)
    val md = if (portable) threadMd5() else null
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h =
          if (portable) shingleHashPortable(md, shingles.getUTF8String(i))
          else shingleHash64(shingles.getUTF8String(i))
        var bit = 0
        while (bit < bits) {
          counts(bit) += (if (((h >>> bit) & 1L) == 1L) 1L else -1L)
          bit += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < bits) {
      if (counts(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Map-only exact-substring-dedup rewrite against a BROADCAST duplicate
  * table: re-chunks the document into fixed `chunkLen`-code-point
  * non-overlapping chunks (ragged tail kept), drops every chunk whose
  * value appears in the broadcast (chunk → owner id) map UNLESS this row
  * IS the owner, and re-assembles the survivors in place. The whole
  * rewrite — pass 2 of [[graft.dedup.Dedup.substringDedup]] — happens
  * inside the row, so no document text ever shuffles; the plan is O(1)
  * in the duplicate-table size (the serialized node carries only the
  * broadcast handle, same shape as
  * [[graft.functions.NearestCentroid]]). Chunking counts Unicode code
  * points, matching Spark's and DuckDB's character-based `substr`.
  * Returns STRUCT<n_chunks: BIGINT, kept_chunks: BIGINT,
  * clean_text: STRING>.
  */
case class CleanDupChunks(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[CleanDupChunks.DupTable])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"clean_dup_chunks expects (BIGINT id, STRING text), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_chunks", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("kept_chunks", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("clean_text", StringType,
      nullable = false)))

  override def prettyName: String = "clean_dup_chunks"

  /** Row kernel — public so generated code can call it. Works directly on
    * the UTF8String (substringSQL is code-point based, matching SQL
    * `substr`): hashed mode pays zero UTF-16 decode/re-encode per chunk —
    * the digest hashes the chunk's UTF-8 bytes as-is — and only the
    * string-keyed mode converts chunks for the map lookup. */
  def kernel(id: Long, text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val t = bc.value
    val cpCount = text.numChars()
    val n = if (cpCount == 0) 0 else (cpCount - 1) / t.chunkLen + 1
    val parts = new Array[UTF8String](n)
    var kept = 0
    var k = 0
    while (k < n) {
      val c = text.substringSQL(k * t.chunkLen + 1, t.chunkLen)
      val owner =
        if (t.ownersByHash ne null)
          t.ownersByHash.get(java.lang.Long.valueOf(
            MinHashParams.shingleHash64(c)))
        else t.owners.get(c.toString)
      if (owner == null || owner.longValue() == id) {
        parts(kept) = c; kept += 1
      }
      k += 1
    }
    val clean =
      if (kept == n) text // nothing removed — reuse the input buffer
      else UTF8String.concat(java.util.Arrays.copyOf(parts, kept): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, kept.toLong, clean))
  }

  override protected def nullSafeEval(id: Any, text: Any): Any =
    kernel(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cleanDupChunks", this,
      classOf[CleanDupChunks].getName)
    nullSafeCodeGen(ctx, ev, (id, text) =>
      s"${ev.value} = $ref.kernel($id, $text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity over Unicode code points — the standard
  * record-linkage scorer for short keys (names, titles) where
  * transpositions dominate edit counts. Spark ships levenshtein but no
  * Jaro family; this node fills the gap with the boost-threshold variant
  * (Winkler's prefix bonus — scale 0.1, prefix ≤ 4 — applies only when
  * base Jaro ≥ 0.7), which is what DuckDB's `jaro_winkler_similarity`
  * computes, so scores are strictly verifiable cross-engine (pinned
  * empirically on boundary pairs: below-0.7 prefix-sharing pairs return
  * plain Jaro in both engines). Map-only scalar; codegen via the shared
  * reference-object kernel pattern.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (STRING, STRING), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "jaro_winkler"

  /** Row kernel — public so generated code can call it. */
  def kernel(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    if (java.util.Arrays.equals(a, b)) return 1.0
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched code points compared in order
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro < 0.7) return jaro // boost threshold: no prefix bonus
    var l = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (l < pMax && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaroWinkler", this,
      classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CleanDupChunks {
  /** Broadcast payload: chunk length (code points) and the duplicated
    * chunk values with their owner (min id over containing docs) — keyed
    * either by the chunk STRING (oracle-exact) or by its `xxhash64`
    * digest (`ownersByHash` non-null; the 100 TB mode, where pass 1
    * shuffles fixed-width keys and the broadcast carries 16 bytes per
    * duplicate instead of the chunk text). Exactly one of the two maps
    * is populated. */
  final case class DupTable(chunkLen: Int,
      owners: java.util.HashMap[String, java.lang.Long],
      ownersByHash: java.util.HashMap[java.lang.Long, java.lang.Long])

  def build(chunkLen: Int, dup: Iterable[(String, Long)]): DupTable = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    dup.foreach { case (c, owner) => m.put(c, java.lang.Long.valueOf(owner)) }
    DupTable(chunkLen, m, null)
  }

  def buildHashed(chunkLen: Int, dup: Iterable[(Long, Long)]): DupTable = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    dup.foreach { case (h, owner) =>
      m.put(java.lang.Long.valueOf(h), java.lang.Long.valueOf(owner)) }
    DupTable(chunkLen, null, m)
  }
}

/** Deflate (zlib, fixed level 6) compression ratio of a string's UTF-8
  * bytes: compressed_length / raw_length. The one-number repetition /
  * templated-spam signal the Gopher- and DCLM-style quality rule sets
  * use: looping or boilerplate-heavy text compresses far below normal
  * prose, near-random glyph soup sits above it. Complements the
  * shingle-based [[graft.dedup.Dedup.duplicatedShingleFraction]]
  * (cross-doc) and `TextOps.repetitionScore` (n-gram) signals with a
  * model-free intra-doc measure that needs NO tokenization — one
  * map-only pass over the raw bytes.
  *
  * Empty/blank input reports 1.0 (uncompressible by convention, never a
  * division by zero). The kernel reuses a thread-local `Deflater` —
  * allocation-free per row at steady state. Deliberately NOT
  * oracle-gated: the exact ratio is a zlib implementation detail, so the
  * gate is the spec's parity-with-JDK and ordering properties, and the
  * driver's rows-only check.
  */
/** First `hexLen` hex chars of md5(input), parsed base-16, as a LONG —
  * the single-kernel form of the portable hash-bucket idiom
  * `conv(substring(md5(x), 1, hexLen), 16, 10)::long` that the whole
  * repo keys deterministic sampling, splits, bootstrap draws and Bloom
  * positions on. The SQL chain materializes a 32-char hex string, a
  * substring copy and a base-16 string parse per row; this kernel reads
  * the leading nibbles of the raw digest directly. Value-identical by
  * construction: the i-th hex char of md5 IS the i-th nibble of the
  * digest, and `conv(_, 16, 10)` of ≤ 15 hex chars is an exact
  * unsigned parse (< 2^60, no overflow clamp), so kernel(x, L) ==
  * the chain for every string and L ≤ 15 (ExtensionsSpec pins it on a
  * null/unicode/numeric zoo). Null in → null out, like md5().
  *
  * Per-thread MessageDigest reuse (the [[DeflateRatio]] convention):
  * steady-state rows allocate only the 16-byte digest. */
case class Md5Prefix(child: Expression, hexLen: Int)
    extends UnaryExpression {

  require(hexLen >= 1 && hexLen <= 15,
    s"hexLen must be in [1, 15] (conv parse stays exact), got $hexLen")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): Long = {
    val md = Md5Prefix.threadMd5.get()
    md.reset()
    val d = md.digest(input.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val nibble =
        if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf
        else d(i >> 1) & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Prefix", this,
      classOf[Md5Prefix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Prefix {
  private[functions] val threadMd5
      : ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
}

/** The STRING twin of [[Md5Prefix]]: the first `hexLen` lowercase hex
  * characters of md5(input) — value-identical to
  * `substring(md5(x), 1, hexLen)` (hex char i IS digest nibble i), with
  * the same per-thread reused MessageDigest and none of the 32-char
  * hex-encode + substring copy per row (Spark's Md5 also constructs a
  * fresh MessageDigest per call). For the synthesis/fixture sites that
  * need the hex TEXT itself (q208's high-entropy words); sites that
  * parse the prefix as a number keep using [[Md5Prefix]]. */
case class Md5PrefixHex(child: Expression, hexLen: Int)
    extends UnaryExpression {

  require(hexLen >= 1 && hexLen <= 32,
    s"hexLen must be in [1, 32], got $hexLen")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_hex expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "md5_prefix_hex"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): UTF8String = {
    val md = Md5Prefix.threadMd5.get()
    md.reset()
    val d = md.digest(input.getBytes)
    val out = new Array[Byte](hexLen)
    var i = 0
    while (i < hexLen) {
      val nibble =
        if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf
        else d(i >> 1) & 0xf
      out(i) = Md5PrefixHex.HexChars(nibble)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5PrefixHex", this,
      classOf[Md5PrefixHex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5PrefixHex {
  private[functions] val HexChars: Array[Byte] =
    "0123456789abcdef".getBytes("US-ASCII")
}

/** Dense hash-bucket token counts in one pass per row: for an
  * ARRAY<STRING> token column, the `numBuckets`-long count array where
  * slot b counts the tokens with `hashBucket(token, numBuckets) == b`
  * (i.e. `pmod(md5_prefix(token, 8), numBuckets)` — the portable
  * [[Md5Prefix]] bucket the whole repo keys splits and features on).
  * Null and empty tokens are skipped, mirroring the
  * `filter(length(token) > 0)` step of the explode formulation.
  *
  * This is the feature-hashing (HashingTF) vectorizer as a MAP-ONLY
  * projection: the former explode → groupBy(doc, bucket) formulation
  * shuffled one row per token instance; this kernel emits one bounded
  * array per document and nothing shuffles — the same
  * scale argument as [[MinHashSignature]], applied to the classifier
  * feature build (q110/q217/q218/q282). Output slots are exact instance
  * counts, so `posexplode` + `n > 0` reproduces the tall (bucket, n)
  * frame bit-for-bit. */
case class HashBucketCounts(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets >= 1 && numBuckets <= (1 << 22),
    s"numBuckets must be in [1, 2^22], got $numBuckets")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hash_bucket_counts expects ARRAY<STRING>, got " +
          s"${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hash_bucket_counts"

  /** Row kernel — public so generated code can call it. */
  def kernel(tokens: ArrayData): ArrayData = {
    val md = Md5Prefix.threadMd5.get()
    val counts = new Array[Long](numBuckets)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          md.reset()
          val d = md.digest(t.getBytes)
          // first 8 hex chars of md5 == first 4 digest bytes, unsigned —
          // exactly Md5Prefix.kernel(t, 8), always in [0, 2^32)
          val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          counts((v % numBuckets).toInt) += 1L
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(Long.box(_): Any))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashBucketCounts", this,
      classOf[HashBucketCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "deflate_ratio"

  /** Row kernel — public so generated code can call it. */
  def kernel(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = DeflateRatio.threadDeflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = DeflateRatio.threadBuf.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateRatio", this,
      classOf[DeflateRatio].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateRatio {
  /** Fixed compression level: ratios must be comparable across rows,
    * executors, and rounds, so the level is not a parameter. */
  val Level = 6

  /** Deliberate trade-off: the per-thread Deflater's native zlib state is
    * retained for the JVM lifetime (never end()'d) so steady-state rows
    * are allocation-free. Executor task threads are pooled — the pinned
    * native memory is bounded by pool size, not row count. Revisit with a
    * removal hook only if a deployment churns threads. */
  private[functions] val threadDeflater
      : ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(Level, /* nowrap = */ false))

  private[functions] val threadBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))
}

object HashExpressions {
  /** Column-level MinHash signature over an ARRAY<STRING> shingle column. */
  def minhashSignature(shingles: Column, numHashes: Int,
                       portable: Boolean = false): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes,
      portable))

  /** Column-level SimHash fingerprint over an ARRAY<STRING> shingle column
    * (64-bit; 60-bit in portable mode). */
  def simhash64(shingles: Column, portable: Boolean = false): Column =
    Bridge.column(SimHash64(Bridge.expression(shingles), portable))

  /** Column-level Jaro-Winkler similarity (see [[JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Column-level md5 hex-prefix value (see [[Md5Prefix]]). */
  def md5Prefix(key: Column, hexLen: Int): Column =
    Bridge.column(Md5Prefix(Bridge.expression(key), hexLen))

  /** Column-level md5 hex-prefix STRING (see [[Md5PrefixHex]]) —
    * value-identical to `substring(md5(key), 1, hexLen)`. */
  def md5PrefixHex(key: Column, hexLen: Int): Column =
    Bridge.column(Md5PrefixHex(Bridge.expression(key), hexLen))

  /** Column-level dense hash-bucket count array over an ARRAY<STRING>
    * token column (see [[HashBucketCounts]]). */
  def hashBucketCounts(tokens: Column, numBuckets: Int): Column =
    Bridge.column(HashBucketCounts(Bridge.expression(tokens), numBuckets))

  /** Column-level deflate compression ratio (see [[DeflateRatio]]). */
  def deflateRatio(text: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(text)))

  /** Column-level substring-dedup rewrite against a BROADCAST duplicate
    * table (see [[CleanDupChunks]]). */
  def cleanDupChunks(id: Column, text: Column,
      bc: org.apache.spark.broadcast.Broadcast[CleanDupChunks.DupTable])
      : Column =
    Bridge.column(CleanDupChunks(Bridge.expression(id),
      Bridge.expression(text), bc))
}
