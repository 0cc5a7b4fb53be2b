package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path.
  *
  * The higher-order-function formulation (transform + sha2/conv per
  * shingle, then 32 x array_min(transform(...)) for the signature) pays
  * per-element interpreted-lambda plumbing and string allocation for
  * every shingle — and the generated wrapper code is large enough that
  * janino compilation alone costs seconds per query. These expressions
  * do the same per-row work in one plain-JVM loop each.
  *
  * Each expression implements `doGenCode` (a call into the shared
  * static evaluator below), NOT `CodegenFallback`: fallback expressions
  * are excluded from whole-stage codegen entirely, which would split
  * the dedup projection out of the fused stage and force row
  * materialization around the hottest per-row work in the engine. The
  * per-row loops themselves stay in the static helpers — the generated
  * code only marshals the child value, so both the interpreted and
  * codegen paths run byte-identical logic.
  *
  * Hash compatibility is exact: shingle hash = first 4 bytes of
  * sha256(shingle utf8) as an unsigned 32-bit value — identical to
  * `conv(substring(sha2(s,256),1,8),16,10)` and to the DuckDB oracle's
  * `('0x' || substr(sha256(s),1,8))::BIGINT`.
  */
object NativeText {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** sha256(utf8) -> first 4 bytes as unsigned int in a long. */
  def hash32(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  val ShingleHashName = "graft_shingle_hash32"
  val MinHashSigPrefix = "graft_minhash_sig"
  val BandHashName = "graft_band_hashes"
  val SimHashName = "graft_simhash32"
  val TextRepetitionName = "graft_text_repetition"
  val WinnowName = "graft_winnow_min"

  /** Register the native text functions on a session (idempotent). */
  def register(spark: SparkSession, minHashCounts: Seq[Int] = Seq(32)): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      ShingleHashName,
      exprs => WordShingleHash32(exprs(0), exprs(1)),
      "built-in")
    minHashCounts.foreach { n =>
      reg.createOrReplaceTempFunction(
        s"$MinHashSigPrefix$n",
        exprs => MinHashSig(exprs.head, n),
        "built-in")
    }
    reg.createOrReplaceTempFunction(
      BandHashName,
      exprs => LshBandHashes(
        exprs(0),
        LiteralArgs.toInt(exprs(1)),
        LiteralArgs.toInt(exprs(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      SimHashName,
      exprs => SimHashSig(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      TextRepetitionName,
      exprs => TextRepetitionStats(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      WinnowName,
      exprs => WinnowMin(exprs(0), LiteralArgs.toInt(exprs(1))),
      "built-in")
  }

  /** Column API (requires [[register]] on the owning session). */
  def shingleHash32(words: Column, n: Int): Column =
    call_function(ShingleHashName, words, org.apache.spark.sql.functions.lit(n))

  def minHashSig(hashes: Column, numHashes: Int): Column =
    call_function(s"$MinHashSigPrefix$numHashes", hashes)

  def bandHashes(sig: Column, bands: Int, rows: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(BandHashName, sig, lit(bands), lit(rows))
  }

  def simHash32(hashes: Column): Column =
    call_function(SimHashName, hashes)

  def textRepetitionStats(text: Column): Column =
    call_function(TextRepetitionName, text)

  def winnowMin(hashes: Column, window: Int): Column =
    call_function(WinnowName, hashes, org.apache.spark.sql.functions.lit(window))

  private val hexDigits = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def sha256Hex(s: String): UTF8String = {
    val d = digests.get()
    d.reset()
    UTF8String.fromString(
      toHex(d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
  }

  // ---- static evaluators, shared by the interpreted eval and the
  // generated code (Scala object => static forwarders, so generated
  // Java calls graft.plans.NativeText.<method> directly) ----

  /** words + shingle size -> portable 32-bit hashes of the word
    * n-grams (space-joined). See [[WordShingleHash32]].
    */
  def shingleHashEval(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val count = math.max(len - (n - 1), 0)
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        // null words render as empty (matches concat_ws skipping nulls
        // only BETWEEN separators is not an issue here: split() never
        // produces null elements)
        val w = a.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      out(i) = hash32(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** shingle hashes -> minhash signature under the (as, bs) universal
    * hash family. See [[MinHashSig]].
    */
  def minHashEval(
      h: ArrayData, as: Array[Long], bs: Array[Long], prime: Long): ArrayData = {
    val len = h.numElements()
    val numHashes = as.length
    val out = new Array[Any](numHashes)
    if (len == 0) {
      // empty shingle set -> null signature values (array_min of empty)
      java.util.Arrays.fill(out, null)
      return new GenericArrayData(out)
    }
    var i = 0
    while (i < numHashes) {
      val a = as(i)
      val b = bs(i)
      var min = Long.MaxValue
      var j = 0
      while (j < len) {
        val v = (a * h.getLong(j) + b) % prime
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** minhash signature -> LSH band-key strings. See [[LshBandHashes]]. */
  def bandHashEval(s: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder()
    var b = 0
    while (b < bands) {
      // exact concat_ws composition: outer join is "b" + "," + inner,
      // where inner joins the NON-NULL slice values with "," (an
      // all-null slice yields the empty string, so the key is "b,").
      sb.setLength(0)
      sb.append(b)
      sb.append(',')
      var j = 0
      var first = true
      while (j < rows) {
        val idx = b * rows + j
        if (idx < s.numElements() && !s.isNullAt(idx)) {
          if (!first) sb.append(',')
          sb.append(s.getLong(idx))
          first = false
        }
        j += 1
      }
      out(b) = sha256Hex(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** text -> (n_words, dup_word_frac, dup_bigram_frac, dup_trigram_frac)
    * in ONE pass. Semantics are exactly the HOF formulation
    * ([[graft.functions.TextFunctions.dupNgramFraction]]) and the
    * DuckDB oracle:
    *   - normalize = trim(regexp_replace(lower(text), "\\s+", " "))
    *     (UTF8String.toLowerCase is what Catalyst's Lower uses; the
    *     trim strips only the ' ' that collapse just produced)
    *   - words = split on ' ' (empty normalized text -> one "" word,
    *     matching Spark split and DuckDB string_split)
    *   - n-gram count = max(words - (n-1), 0); frac = repeats/count,
    *     0.0 when the count is 0
    *   - null text -> (null, 0.0, 0.0, 0.0): size(null)=null for
    *     n_words, the when() otherwise-branch for the fractions
    * See [[TextRepetitionStats]].
    */
  /** The fixed stopword set [[QualityTextStats]] counts (top English
    * function words — the Gopher/C4 filters' intent). Single source:
    * [[graft.operators.QualityRules.Stopwords]] re-exports this.
    */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "that", "for", "it")

  private val qualityStopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    QualityStopwords.foreach(s.add)
    s
  }

  /** Raw text -> (n_words, sum_word_len, stop_count, distinct_count,
    * top_count) in ONE pass — the exact counts behind the five
    * Gopher/C4 quality ratios. Same normalization/tokenization
    * contract as [[textRepetitionEval]]; word length counts CODE
    * POINTS (Spark `length` ≡ DuckDB `length`), never UTF-16 units.
    * Null text -> all-null counts, so the downstream ratio and gate
    * expressions null-propagate exactly like the HOF formulation.
    */
  def qualityStatsEval(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    if (text == null) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, null, null, null))
    }
    val norm0 = wsPattern.matcher(text.toLowerCase.toString).replaceAll(" ")
    var lo = 0
    var hi = norm0.length
    while (lo < hi && norm0.charAt(lo) == ' ') lo += 1
    while (hi > lo && norm0.charAt(hi - 1) == ' ') hi -= 1
    val norm = norm0.substring(lo, hi)
    val words = norm.split(" ", -1) // "" -> Array(""), like Spark's split
    val counts = new java.util.HashMap[String, Int](words.length * 2)
    var sumLen = 0L
    var stop = 0L
    var top = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      sumLen += w.codePointCount(0, w.length)
      if (qualityStopSet.contains(w)) stop += 1
      val c = counts.merge(w, 1, (x, y) => x + y)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words.length.toLong, sumLen, stop, counts.size.toLong, top.toLong))
  }

  /** Column API for [[QualityTextStats]] — built directly into the
    * Column (no registry slot; the expression is stateless but the
    * direct form keeps analysis independent of session registration
    * order).
    */
  def qualityTextStats(text: Column): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      QualityTextStats(
        org.apache.spark.sql.classic.GraftPlanApi.expression(text)))

  /** Apply an ordered BPE merge table to a word array: every word
    * becomes char tokens + `</w>`, then each merge runs one greedy
    * left-to-right pass (identical semantics to
    * [[graft.operators.Bpe]]'s per-round fold — a token merged in a
    * pass matches later occurrences of that pass only in combined
    * form). ONE JVM loop regardless of vocabulary size — the
    * expression-fold formulation nested one lambda PER MERGE, so a
    * 1000-merge model built a 1000-deep tree that broke codegen at
    * exactly the scale training targets. `merges` is flattened
    * [a0, b0, a1, b1, …].
    */
  def bpeEncodeEval(words: ArrayData, merges: Array[String]): ArrayData = {
    if (words == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi).toString
      var tokens = scala.collection.mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        tokens += new String(Character.toChars(cp))
        ci += Character.charCount(cp)
      }
      tokens += "</w>"
      var mi = 0
      while (mi < merges.length) {
        val a = merges(mi); val b = merges(mi + 1); val ab = a + b
        val next = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
        var ti = 0
        while (ti < tokens.length) {
          val t = tokens(ti)
          if (next.nonEmpty && next.last == a && t == b)
            next(next.length - 1) = ab
          else next += t
          ti += 1
        }
        tokens = next
        mi += 2
      }
      tokens.foreach(t => out += UTF8String.fromString(t))
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API for [[BpeEncodeExpr]] (merge table inlined into the
    * expression — model-bound, so no registry slot; see the
    * HashWeightSum precedent).
    */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.classic.GraftPlanApi.column(
      BpeEncodeExpr(
        org.apache.spark.sql.classic.GraftPlanApi.expression(words),
        merges.flatMap(m => Seq(m._1, m._2)).toArray))

  def textRepetitionEval(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    if (text == null) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, 0.0, 0.0, 0.0))
    }
    val norm0 = wsPattern.matcher(text.toLowerCase.toString).replaceAll(" ")
    // trim only spaces (all \s runs are now single ' '); Java's
    // String.trim would also strip non-\s control chars Spark keeps
    var lo = 0
    var hi = norm0.length
    while (lo < hi && norm0.charAt(lo) == ' ') lo += 1
    while (hi > lo && norm0.charAt(hi - 1) == ' ') hi -= 1
    val norm = norm0.substring(lo, hi)
    val words = norm.split(" ", -1) // "" -> Array(""), like Spark's split
    val n = words.length
    val seen1 = new java.util.HashSet[String](n * 2)
    var dup1 = 0
    var i = 0
    while (i < n) {
      if (!seen1.add(words(i))) dup1 += 1
      i += 1
    }
    val frac1 = dup1.toDouble / n // n >= 1 always (split of "" is [""])
    val sb = new java.lang.StringBuilder()
    def dupFrac(g: Int): Double = {
      val cnt = n - (g - 1)
      if (cnt <= 0) return 0.0
      val seen = new java.util.HashSet[String](cnt * 2)
      var dups = 0
      var i = 0
      while (i < cnt) {
        sb.setLength(0)
        var j = 0
        while (j < g) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        if (!seen.add(sb.toString)) dups += 1
        i += 1
      }
      dups.toDouble / cnt
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, frac1, dupFrac(2), dupFrac(3)))
  }

  /** k-gram hash array + window size -> winnowed fingerprint set
    * (sorted distinct sliding-window minima), the Schleimer/Wilkerson/
    * Aiken "winnowing" selection. One O(n) monotonic-deque pass; the
    * fingerprint is the SET of selected hash values, so tie position
    * (leftmost vs rightmost minimum) cannot affect the result and the
    * oracle's per-window `list_min` replays it exactly.
    *
    * len == 0 -> empty; 0 < len < w -> the single whole-array window
    * (winnowing's at-least-one-fingerprint guarantee). See [[WinnowMin]].
    */
  def winnowEval(h: ArrayData, w: Int): ArrayData = {
    val len = h.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (len <= w) {
      var min = Long.MaxValue
      var i = 0
      while (i < len) { val v = h.getLong(i); if (v < min) min = v; i += 1 }
      selected.add(min)
    } else {
      // deque of indices with ascending hash values; head = window min
      val idx = new Array[Int](len)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < len) {
        val v = h.getLong(i)
        while (tail > head && h.getLong(idx(tail - 1)) >= v) tail -= 1
        idx(tail) = i; tail += 1
        if (idx(head) <= i - w) head += 1
        if (i >= w - 1) selected.add(h.getLong(idx(head)))
        i += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** hashed-feature linear model: sum of weights[h floorMod F] over the
    * word-hash array — the inference kernel of the hashing-trick text
    * classifier ([[graft.operators.TextClassifier]]). One primitive
    * loop per row. floorMod keeps the kernel total on arbitrary
    * array<long> input (a negative hash must not index negative);
    * for [[hash32]]'s non-negative range it is identical to `%`.
    */
  def hashWeightSumEval(h: ArrayData, w: Array[Double]): Double = {
    val f = w.length
    var s = 0.0
    var i = 0
    val len = h.numElements()
    while (i < len) {
      s += w(java.lang.Math.floorMod(h.getLong(i), f))
      i += 1
    }
    s
  }

  /** word-hash array -> 32-bit SimHash. See [[SimHashSig]]. */
  def simHashEval(h: ArrayData): Long = {
    val len = h.numElements()
    val votes = new Array[Int](32)
    var j = 0
    while (j < len) {
      val v = h.getLong(j)
      var b = 0
      while (b < 32) {
        if (((v >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** minhash signature -> LSH band-key strings: band b's key is
  * sha256-hex of "b,v1,...,vr" over its signature slice — identical
  * strings to the composed sha2/concat_ws/slice formulation and the
  * DuckDB oracle.
  */
case class LshBandHashes(sig: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def child: Expression = sig
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = sig.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("band_hashes requires array<long>")
  }

  override def nullSafeEval(input: Any): Any =
    NativeText.bandHashEval(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NativeText.bandHashEval($c, $bands, $rows)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(sig = c)
}

/** words array + shingle size n -> array of portable 32-bit hashes of
  * the word n-gram shingles (space-joined). n must be a foldable int.
  */
case class WordShingleHash32(words: Expression, nExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(words, nExpr)
  override def nullable: Boolean = words.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = words.dataType match {
    case ArrayType(StringType, _) if nExpr.foldable && nExpr.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_hash32 requires (array<string>, foldable int)")
  }

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = words.eval(input)
    if (arr == null) return null
    NativeText.shingleHashEval(arr.asInstanceOf[ArrayData], n)
  }

  // n is foldable by the type check, so only the words child generates
  // code — n is baked in as an int literal
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsGen = words.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${wordsGen.code}
      boolean ${ev.isNull} = ${wordsGen.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.plans.NativeText.shingleHashEval(${wordsGen.value}, $n);
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(words = c(0), nExpr = c(1))
}

/** k-gram hash array -> winnowed fingerprint set: sorted distinct
  * minima of every `window`-length sliding window (single whole-array
  * window when the doc has fewer than `window` k-grams, empty for
  * empty input). The selection that makes fingerprint overlap detect
  * partial duplication with bounded fingerprint density (~len/window
  * per doc) — see [[NativeText.winnowEval]].
  */
case class WinnowMin(hashes: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, s"winnow window must be >= 1, got $window")

  override def child: Expression = hashes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeText.WinnowName} requires array<long>")
  }

  override def nullSafeEval(input: Any): Any =
    NativeText.winnowEval(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NativeText.winnowEval($c, $window)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(hashes = c)
}

/** Pre-computed 32-bit word-hash array -> 32-bit SimHash in one pass:
  * per bit position, majority vote of word-hash bits (+1 set / -1
  * unset); signature bit set iff the vote is strictly positive.
  * Bit-identical to the HOF formulation
  * ([[graft.operators.Dedup.simHashFromHashes]]) and the DuckDB oracle,
  * but a single O(len × 32) primitive loop instead of 32 interpreted
  * aggregate passes over the array.
  */
case class SimHashSig(hashes: Expression)
    extends UnaryExpression {

  override def child: Expression = hashes
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_simhash32 requires array<long>")
  }

  override def nullSafeEval(input: Any): Any =
    NativeText.simHashEval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeText.simHashEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(hashes = c)
}

/** text -> struct(n_words, dup_word_frac, dup_bigram_frac,
  * dup_trigram_frac): the repetition family of quality signals in ONE
  * per-row pass (normalize + split + three hash-set membership loops).
  *
  * The HOF formulation pays interpreted-lambda plumbing per shingle
  * and re-evaluates the shingle array for every reference (transform /
  * array_distinct are not codegen'd) — at sf0.1 that made
  * q_text_repetition the single most expensive query in the bench
  * (31 s of a 61 s total). This expression is never null (null text
  * yields (null, 0.0, 0.0, 0.0) inside the struct, the same values the
  * when()/otherwise formulation and the DuckDB oracle produce).
  */
case class TextRepetitionStats(text: Expression)
    extends UnaryExpression {

  override def child: Expression = text
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = true),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${NativeText.TextRepetitionName} requires a string column")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    NativeText.textRepetitionEval(
      text.eval(input).asInstanceOf[UTF8String])

  // the evaluator handles a null child itself (null text is data, not
  // a null result), so the generated code passes the null through
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = text.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      $javaType ${ev.value} = graft.plans.NativeText.textRepetitionEval(
        ${childGen.isNull} ? null : ${childGen.value});""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(text = c)
}

/** Word-hash array -> hashing-trick linear score: sum over hashes of
  * `weights[h mod weights.length]`. Weights ride along as a reference
  * object (one double[] field in the generated class, no per-row
  * allocation); every partial sum of dyadic-rational weights is exact,
  * which is what makes the untrained classifier oracle-replayable
  * order-independently.
  */
/** BPE merge application over a word array — one JVM pass per row for
  * any vocabulary size (see [[NativeText.bpeEncodeEval]]). `merges` is
  * the flattened ordered pair table; it rides the expression as a
  * reference object, not per-row data.
  */
case class BpeEncodeExpr(words: Expression, merges: Array[String])
    extends UnaryExpression {

  override def child: Expression = words
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = words.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe encode requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(w: Any): Any =
    NativeText.bpeEncodeEval(w.asInstanceOf[ArrayData], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[Array[String]].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.plans.NativeText.bpeEncodeEval($w, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(words = c)
}

/** Single-pass quality-signal counts for the Gopher/C4 gate
  * ([[graft.operators.QualityRules]]): one traversal of the
  * normalized token stream replaces five higher-order-function
  * expression trees (each re-normalizing and re-splitting the text —
  * lambda-bearing trees are excluded from subexpression elimination,
  * so the HOF form repeated that work per signal AND again in the
  * pass predicate). Struct output; consumers extract fields, and
  * whole-stage codegen CSEs the single call.
  */
case class QualityTextStats(text: Expression)
    extends UnaryExpression {

  override def child: Expression = text
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = true),
    StructField("sum_word_len", LongType, nullable = true),
    StructField("stop_count", LongType, nullable = true),
    StructField("distinct_count", LongType, nullable = true),
    StructField("top_count", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft quality stats requires a string column")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    NativeText.qualityStatsEval(text.eval(input).asInstanceOf[UTF8String])

  // null text is data (all-null counts), handled inside the evaluator
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = text.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      $javaType ${ev.value} = graft.plans.NativeText.qualityStatsEval(
        ${childGen.isNull} ? null : ${childGen.value});""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(text = c)
}

case class HashWeightSum(hashes: Expression, weights: Array[Double])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")

  override def child: Expression = hashes
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_hash_weight_sum requires array<long>")
  }

  override def nullSafeEval(input: Any): Any =
    NativeText.hashWeightSumEval(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NativeText.hashWeightSumEval($c, $wRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(hashes = c)
}

/** Pre-computed shingle-hash array -> minhash signature of `numHashes`
  * values using the deterministic universal-hash family from
  * [[graft.operators.Dedup.minHashParams]]. One tight primitive loop.
  */
case class MinHashSig(hashes: Expression, numHashes: Int)
    extends UnaryExpression {

  override def child: Expression = hashes
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = hashes.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("minhash_sig requires array<long>")
  }

  // (a_i, b_i) as primitive arrays for the hot loop
  private lazy val (as, bs) = {
    val ps = graft.operators.Dedup.minHashParams(numHashes)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }
  private val prime = graft.operators.Dedup.MinHashPrime

  override def nullSafeEval(input: Any): Any =
    NativeText.minHashEval(input.asInstanceOf[ArrayData], as, bs, prime)

  // the hash family rides along as reference objects — the generated
  // code sees two long[] fields, no per-row allocation
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NativeText.minHashEval($c, $asRef, $bsRef, ${prime}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(hashes = c)
}
