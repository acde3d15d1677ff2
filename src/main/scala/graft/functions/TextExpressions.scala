package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-statistics expressions.
  *
  * The composable forms (`size(filter(split(lower(text), " "), _.isin(...)))`
  * per language) are higher-order functions — Spark evaluates those on the
  * interpreted path, and a when-chain that references k scores duplicates
  * the whole tokenize+filter tree per reference. [[StopwordCounts]] replaces
  * all of it with one tokenization pass per row and a hash lookup per token,
  * inside whole-stage codegen where identical subtrees are also CSE'd.
  * Values are bit-identical to the composable forms (same split-on-space,
  * same `lower` semantics), so the DuckDB oracles are unchanged.
  */

/** Token count + per-profile stopword hit counts of a text, one pass.
  *
  * Output: `array<int>` of length `profiles.size + 1` — element 0 is the
  * whitespace-token count (empty tokens dropped, exactly
  * `size(filter(split(text, " "), t => t != ""))`), element i+1 the number
  * of tokens whose lowercase form appears in `profiles(i)`. A token in
  * several profiles counts for each (matching the per-language `isin`
  * semantics). Null text → null.
  */
case class StopwordCounts(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] =
    StopwordCounts.buildLookup(profiles)

  override protected def nullSafeEval(input: Any): Any =
    StopwordCounts.compute(input.asInstanceOf[UTF8String], lookup, profiles.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("stopwordLookup", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopwordCounts.compute($c, $mapRef, ${profiles.length});")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}

object StopwordCounts {

  def buildLookup(profiles: Seq[Seq[String]]): java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for ((words, i) <- profiles.zipWithIndex; w <- words) {
      val key = UTF8String.fromString(w).toLowerCase
      val prev = m.get(key)
      m.put(key, if (prev == null) Array(i) else prev :+ i)
    }
    m
  }

  def compute(text: UTF8String, lookup: java.util.HashMap[UTF8String, Array[Int]],
      nProfiles: Int): ArrayData = {
    val counts = new Array[Int](nProfiles + 1)
    val bytes = text.getBytes
    var start = 0
    var i = 0
    val n = bytes.length
    // split on the space byte (0x20 never occurs inside a multi-byte UTF-8
    // sequence), dropping empty tokens — same as split(text, " ") + filter
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          counts(0) += 1
          if (!lookup.isEmpty) {
            val tok = UTF8String.fromBytes(bytes, start, i - start).toLowerCase
            val hit = lookup.get(tok)
            if (hit != null) {
              var j = 0
              while (j < hit.length) { counts(hit(j) + 1) += 1; j += 1 }
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Count of characters of `text` contained in the ASCII set `chars` — the
  * one-pass form of `length(text) - length(regexp_replace(text, "[...]",
  * ""))`. ASCII bytes never appear inside multi-byte UTF-8 sequences, so a
  * byte scan counts characters exactly. Null text → null.
  */
case class AsciiCharCount(child: Expression, chars: String)
    extends UnaryExpression {
  require(chars.forall(_ < 128), s"AsciiCharCount needs ASCII chars (got '$chars')")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      AsciiCharCount.compute(input.asInstanceOf[UTF8String], table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("charTable", table, "boolean[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiCharCount.compute($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiCharCount =
    copy(child = newChild)
}

object AsciiCharCount {
  def compute(text: UTF8String, table: Array[Boolean]): Int = {
    val bytes = text.getBytes
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && table(b)) c += 1
      i += 1
    }
    c
  }
}

/** 64-bit hashes of the word k-shingles of a token array, one pass — the
  * fused form of `transform(word_shingles(toks, k), s => hash(s))` that
  * never allocates the shingle strings: each shingle's hash is computed by
  * feeding the k token byte-slices (space-separated) straight into the
  * FNV-1a/splitmix pipeline of [[Hash64]]. Used where only shingle
  * *identity* matters (n-gram-Jaccard candidate generation): an 8-byte join
  * key instead of a multi-word string — at corpus scale this cuts the
  * explode-shuffle volume ~5-10×. Null/short input → empty array.
  */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
        val t = toks(i + j)
        var b = 0
        while (b < t.length) { h ^= (t(b) & 0xffL); h *= 0x100000001b3L; b += 1 }
        j += 1
      }
      out(i) = Hash64.mix(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Hot-line hash pairs sorted lexicographically by (h1, h2), as two
  * parallel primitive arrays — the broadcast payload of
  * [[StripLinesByHash]]. 16 B per entry, built ONCE on the driver
  * (inside the fail-fast row bound of
  * [[graft.dedup.Dedup.stripLinesBroadcast]]), decoded once per executor
  * by Spark's broadcast manager, and probed by binary search on h1 —
  * membership is O(log n) per line with ZERO per-row allocation. The
  * round-12 shape (array<long> column on a 1-row broadcast join, decoded
  * and linearly scanned per document row) copied the whole index for
  * every row and went O(doc_lines × index): harmless at the fixture's
  * dozens of hot lines, quadratic at a real corpus's 10⁵–10⁷.
  */
final class SortedHashPairs private (val h1: Array[Long], val h2: Array[Long])
    extends Serializable {
  def size: Int = h1.length
}

object SortedHashPairs {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  val Empty: SortedHashPairs = new SortedHashPairs(Array.empty, Array.empty)

  /** seed of `xxhash64(0x5eed, s)`: the 0x5eed literal hashed first —
    * with hashInt, because an undecorated Scala integer literal is
    * IntegerType (hashLong here would silently zero the match rate; the
    * DedupSpec parity test exists to catch exactly that).
    */
  val Seed2: Long = XXH64.hashInt(0x5eed, 42L)

  /** The two-seed 128-bit hash pair of a string — the same pair
    * `xxhash64(s)` / `xxhash64(0x5eed, s)` evaluate to, so driver-built
    * indexes stay hash-parity with engine-built ones.
    */
  def hashPair(s: UTF8String): (Long, Long) =
    (XXH64.hashUTF8String(s, 42L), XXH64.hashUTF8String(s, Seed2))

  /** Driver-side index build from raw strings (e.g. blocklist patterns):
    * hash with [[hashPair]], sort once.
    */
  def ofStrings(values: Array[String]): SortedHashPairs =
    build(values.map(v => hashPair(UTF8String.fromString(v))))

  /** Sort (h1, h2) pairs lexicographically; duplicates are harmless
    * (membership is any-match), so unioned per-epoch indexes need no
    * driver-side dedup here.
    */
  def build(pairs: Array[(Long, Long)]): SortedHashPairs = {
    if (pairs.isEmpty) return Empty
    val sorted = pairs.sorted
    val a = new Array[Long](sorted.length)
    val b = new Array[Long](sorted.length)
    var i = 0
    while (i < sorted.length) { a(i) = sorted(i)._1; b(i) = sorted(i)._2; i += 1 }
    new SortedHashPairs(a, b)
  }
}

/** One-pass boilerplate-line strip against a broadcast hash index — the
  * STREAMING form of [[graft.dedup.Dedup.stripLinesIndexed]]: the batch
  * op explodes lines and anti-joins (right at rest, wrong in a stream —
  * per-document reassembly would be an unbounded stateful aggregation),
  * while this expression filters a document's lines in place, per row,
  * no state, no shuffle, no join at all. `index` is the
  * [[graft.dedup.Dedup.lineIndex]] pairs collected under a fail-fast row
  * bound, sorted, and broadcast as [[SortedHashPairs]] — one decode per
  * executor, binary-searched per line.
  *
  * Hash parity is the contract: line hashes are computed with catalyst's
  * own XXH64 exactly as `xxhash64(line)` / `xxhash64(0x5eed, line)`
  * evaluate them, so an index built by the batch operator drives this
  * expression byte-for-byte (pinned in DedupSpec). Splits on the LF byte
  * (0x0A never occurs inside a multi-byte UTF-8 sequence), preserving
  * trailing empties like `split(text, "\n")`. The second hash is only
  * computed for lines whose h1 hits the index. Returns
  * struct(clean_text, n_lines, n_removed); null text → null.
  */
case class StripLinesByHash(child: Expression,
    index: org.apache.spark.broadcast.Broadcast[SortedHashPairs],
    sep: Byte = '\n') extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(sep >= 0, s"sep must be an ASCII byte (got $sep)")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val sorted: SortedHashPairs = index.value

  override protected def nullSafeEval(text: Any): Any =
    StripLinesByHash.compute(text.asInstanceOf[UTF8String], sorted, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("hotLineIndex", index,
      "org.apache.spark.broadcast.Broadcast")
    // broadcast decoded ONCE per operator instance (per task), not per row
    val sortedVar = ctx.addMutableState("graft.functions.SortedHashPairs",
      "hotSorted", v => s"$v = (graft.functions.SortedHashPairs) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.StripLinesByHash.compute($t, $sortedVar, (byte) $sep);")
  }

  override protected def withNewChildInternal(newChild: Expression): StripLinesByHash =
    copy(child = newChild)
}

object StripLinesByHash {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val Seed2 = SortedHashPairs.Seed2

  def compute(text: UTF8String, hot: SortedHashPairs,
      sep: Byte): org.apache.spark.sql.catalyst.InternalRow = {
    val h1s = hot.h1
    val h2s = hot.h2
    val bytes = text.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var outLen = 0
    var kept = 0
    var total = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == sep) {
        total += 1
        val len = i - start
        // hashUTF8String, not hashUnsafeBytes: the word-block tail
        // handling differs, and parity with xxhash64() is the contract
        val line = UTF8String.fromBytes(bytes, start, len)
        val h1 = XXH64.hashUTF8String(line, 42L)
        var isHot = false
        var j = java.util.Arrays.binarySearch(h1s, h1)
        if (j >= 0) {
          // h2 computed only on an h1 hit; walk the (rare) equal-h1 run
          val h2 = XXH64.hashUTF8String(line, Seed2)
          while (j > 0 && h1s(j - 1) == h1) j -= 1
          while (j < h1s.length && h1s(j) == h1 && !isHot) {
            if (h2s(j) == h2) isHot = true
            j += 1
          }
        }
        if (!isHot) {
          if (kept > 0) { out(outLen) = sep; outLen += 1 }
          System.arraycopy(bytes, start, out, outLen, len)
          outLen += len
          kept += 1
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen)),
      total, total - kept))
  }
}

/** Canonical text normalization for dedup keying — the step that runs
  * BEFORE any content hash in a multilingual corpus: the same page
  * arrives as `Café MENU` (decomposed, cased, double-spaced) and
  * `café menu`, and exact/fingerprint dedup only works after both
  * collapse to one canonical string. Three rules, in order:
  *   1. Unicode NFC composition (a decomposed `e` + U+0301 and the
  *      precomposed `é` become the same code point);
  *   2. lowercase (same simple case mapping as `functions.lower` /
  *      DuckDB `lower` — [[UTF8String.toLowerCase]]);
  *   3. whitespace canonicalization: runs of UNICODE whitespace collapse
  *      to one space, leading/trailing runs are dropped. The class is
  *      `Character.isWhitespace ∪ Character.isSpaceChar` = `\p{Z}` plus
  *      the controls {09–0D, 1C–1F} — so an NBSP (U+00A0) or ideographic
  *      space (U+3000) page collapses to the same dedup key as its
  *      ASCII-space twin (the round-12 ASCII-only class missed exactly
  *      those; the DuckDB oracle replays the identical RE2 class).
  * One pass per row inside whole-stage codegen; null text → null. The
  * equivalent built-in composition needs a regexp_replace (non-codegen
  * regex per row) and has no NFC at all — Spark ships no Unicode
  * normalizer, which is what makes this an Expression.
  */
case class NormalizeText(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def compute(text: UTF8String): UTF8String = {
    // NFC via the JDK (skipped when already normalized — the common case
    // costs one isNormalized scan and no re-encode: lowercase the
    // original UTF8String directly instead of round-tripping its bytes
    // through a fresh String), then the exact lower() mapping
    val s = text.toString
    val lowered =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        text.toLowerCase.toString
      else
        UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
          .toLowerCase.toString
    val n = lowered.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < n) {
      val c = lowered.charAt(i)
      // Unicode whitespace: isWhitespace ∪ isSpaceChar = \p{Z} plus the
      // controls {09-0D, 1C-1F} — exactly the RE2 class
      // [\t\n\x0b\f\r\x1c-\x1f\p{Z}] the DuckDB oracle uses (all Unicode
      // whitespace is BMP, so the per-char test is complete)
      if (Character.isWhitespace(c) || Character.isSpaceChar(c)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Per-document top-n-gram coverage — the Gopher repetition family's
  * n-gram signals (dup/top n-gram fractions), computed WITHIN one row:
  * counting a document's own n-grams needs no shuffle, so the naive
  * explode -> groupBy(doc, gram) shape (every gram of every document
  * crossing an exchange) is replaced by one codegen'd pass with a
  * per-row count map keyed by the exact gram STRING (hash-keying would
  * merge colliding grams and corrupt the max).
  *
  * Output struct (all integers, so the acceptance algebra downstream is
  * engine-exact):
  *   - n_tokens, total_chars: token count and `array_join(toks, " ")`
  *     character length (code points, = DuckDB `len`);
  *   - n_ngrams: number of n-grams (max(0, n_tokens - n + 1));
  *   - top_count: the highest occurrence count of any single n-gram;
  *   - top_cover: max over n-grams of occurrences x gram characters —
  *     the numerator of the "top n-gram character fraction" (the gram's
  *     chars include its n-1 separator spaces).
  * Null tokens array -> null. Array elements must be non-null (the
  * tokenizer never emits null tokens).
  */
case class TopNgramStats(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, s"n-gram size must be >= 1 (got $n)")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("total_chars", IntegerType, nullable = false),
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("top_cover", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TopNgramStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopNgramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramStats =
    copy(child = newChild)
}

object TopNgramStats {
  def compute(arr: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val nTok = arr.numElements()
    val toks = new Array[UTF8String](nTok)
    val starts = GramTable.charStarts(arr, toks)
    val totalChars = if (nTok == 0) 0 else starts(nTok) - 1
    val nGrams = math.max(0, nTok - n + 1)
    var topCount = 0
    var topCover = 0
    if (nGrams > 0) {
      val table = new GramTable(toks, n, nGrams)
      var i = 0
      while (i < nGrams) { table.add(i); i += 1 }
      var s = 0
      while (s < table.capacity) {
        val first = table.slotFirst(s)
        if (first >= 0) {
          val c = table.slotCount(s)
          // gram chars = token chars + internal separators, read off the
          // prefix-sum offsets (== numChars of the space-joined gram)
          val cover = c * (starts(first + n) - 1 - starts(first))
          if (c > topCount) topCount = c
          if (cover > topCover) topCover = cover
        }
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nTok, totalChars, nGrams, topCount, topCover))
  }
}

/** Open-addressed per-row n-gram counter keyed by a 64-bit rolling hash of
  * per-token hashes, with EXACT-string verification against the slot's
  * first occurrence on every hash hit — identical results to a map keyed
  * by the gram string (a collision cannot merge two grams: equality is
  * verified token-by-token), without ever materializing a gram string.
  * Per-row allocation is O(n_grams) CONSTANT-SIZE slots (~24 B each) plus
  * the token/offset arrays — the previous string-keyed map allocated
  * O(doc_chars × n) transient chars per row, a multi-MB document's worst
  * case (flagged by the round-13 review; bounded-allocation spec in
  * Round14Spec).
  */
private[functions] final class GramTable(toks: Array[UTF8String],
    tokHash: Array[Long], n: Int, nGrams: Int) {

  /** Convenience constructor for single-n callers; multi-n callers
    * (e.g. [[DupNgramStats]] over n = 5..10) hoist ONE
    * [[GramTable.hashTokens]] array across their tables instead of
    * re-hashing every token's bytes per n.
    */
  def this(toks: Array[UTF8String], n: Int, nGrams: Int) =
    this(toks, GramTable.hashTokens(toks), n, nGrams)
  val capacity: Int = {
    var c = 4L
    while (c < nGrams.toLong * 2) c <<= 1
    // fail by name rather than deadlock the probe loop: a row with > 2^29
    // grams is a corrupt input, not a document
    require(c <= (1L << 30),
      s"GramTable: $nGrams n-grams in ONE row exceeds the per-row bound " +
        "(2^29) — split the document before n-gram analysis")
    c.toInt
  }
  private val mask = capacity - 1
  private val slotHash = new Array[Long](capacity)
  val slotFirst = new Array[Int](capacity)
  val slotCount = new Array[Int](capacity)
  java.util.Arrays.fill(slotFirst, -1)

  private def gramHash(i: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < n) { h = (h ^ tokHash(i + j)) * 0x100000001b3L; j += 1 }
    Hash64.mix(h)
  }

  private def gramsEqual(a: Int, b: Int): Boolean = {
    var j = 0
    while (j < n) {
      if (!toks(a + j).equals(toks(b + j))) return false
      j += 1
    }
    true
  }

  /** Count the gram starting at token `i`; returns its occurrence count
    * AFTER this add (1 = first time seen), which is what keep-first
    * dedup needs in the same single pass.
    */
  def add(i: Int): Int = {
    val h = gramHash(i)
    var s = (h & mask).toInt
    while (true) {
      val first = slotFirst(s)
      if (first < 0) {
        slotHash(s) = h; slotFirst(s) = i; slotCount(s) = 1
        return 1
      }
      if (slotHash(s) == h && gramsEqual(first, i)) {
        slotCount(s) += 1
        return slotCount(s)
      }
      s = (s + 1) & mask
    }
    0
  }

  /** Occurrence count of the gram starting at token `i` (after all adds). */
  def countOf(i: Int): Int = {
    val h = gramHash(i)
    var s = (h & mask).toInt
    while (true) {
      val first = slotFirst(s)
      if (first < 0) return 0
      if (slotHash(s) == h && gramsEqual(first, i)) return slotCount(s)
      s = (s + 1) & mask
    }
    0
  }
}

private[functions] object GramTable {
  /** Per-token FNV-1a (mixed), computed once per row; gram hashes chain
    * these, so no token's bytes are rescanned per gram (or per n).
    */
  def hashTokens(toks: Array[UTF8String]): Array[Long] = {
    val h = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { h(i) = Hash64.hashString(toks(i)); i += 1 }
    h
  }

  /** Fill `toks` from `arr` and return the prefix-sum char offsets of each
    * token in the space-joined text: starts(i) = code-point offset of
    * token i, starts(nTok) = totalChars + 1 (the virtual next start).
    */
  def charStarts(arr: ArrayData, toks: Array[UTF8String]): Array[Int] = {
    val nTok = toks.length
    val starts = new Array[Int](nTok + 1)
    var off = 0
    var i = 0
    while (i < nTok) {
      toks(i) = arr.getUTF8String(i)
      starts(i) = off
      off += toks(i).numChars() + 1
      i += 1
    }
    starts(nTok) = off
    starts
  }
}

/** Per-document DUPLICATE-n-gram character coverage — the second half of
  * the Gopher repetition rules (Rae et al. 2021, arXiv:2112.11446,
  * Table A1): for each n in [minN, maxN], the number of characters of the
  * space-joined text covered by at least one occurrence of an n-gram that
  * occurs MORE THAN ONCE in the document. Coverage is the POSITIONAL
  * union — overlapping occurrences of duplicated grams never double-count
  * a character — computed by an ascending sweep over occurrence intervals
  * (occurrence starts are strictly increasing in token index, so the
  * union is one pass with a running max-end). Complements
  * [[TopNgramStats]]' top-gram half (n = 2..4 thresholds); Gopher gates
  * on dup fractions for n = 5..10 (0.15 down to 0.10).
  *
  * Output struct (integers, so downstream threshold algebra is exact):
  * n_tokens, total_chars, and dup_chars — an array of maxN-minN+1 counts,
  * element k for n = minN+k. Same zero-shuffle shape as the sibling
  * expressions: a document's own n-grams never cross an exchange. Null
  * tokens array → null.
  */
case class DupNgramStats(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(minN >= 1 && maxN >= minN,
    s"need 1 <= minN <= maxN (got $minN..$maxN)")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("total_chars", IntegerType, nullable = false),
    StructField("dup_chars", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    DupNgramStats.compute(input.asInstanceOf[ArrayData], minN, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DupNgramStats.compute($c, $minN, $maxN);")

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

object DupNgramStats {
  def compute(arr: ArrayData, minN: Int,
      maxN: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val nTok = arr.numElements()
    val toks = new Array[UTF8String](nTok)
    val starts = GramTable.charStarts(arr, toks)
    val totalChars = if (nTok == 0) 0 else starts(nTok) - 1
    val dup = new Array[Int](maxN - minN + 1)
    // token bytes hashed ONCE for the whole n range
    val tokHash = GramTable.hashTokens(toks)
    var n = minN
    while (n <= maxN) {
      val nGrams = nTok - n + 1
      // a single occurrence can never be a duplicate: n-gram counts need
      // at least 2 grams to produce one
      if (nGrams >= 2) {
        val table = new GramTable(toks, tokHash, n, nGrams)
        var i = 0
        while (i < nGrams) { table.add(i); i += 1 }
        // ascending sweep: occurrence i covers chars
        // [starts(i), starts(i+n)-1); both ends increase with i, so the
        // positional union is sum of the parts past the running max end
        var dupChars = 0
        var maxEnd = 0
        i = 0
        while (i < nGrams) {
          if (table.countOf(i) > 1) {
            val s = starts(i)
            val e = starts(i + n) - 1
            if (e > maxEnd) {
              dupChars += e - math.max(s, maxEnd)
              maxEnd = e
            }
          }
          i += 1
        }
        dup(n - minN) = dupChars
      }
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nTok, totalChars, new GenericArrayData(dup)))
  }
}

/** Per-document DUPLICATE-LINE statistics — the line-level Gopher
  * repetition rules (Rae et al. 2021, arXiv:2112.11446, Table A1:
  * duplicate line fraction 0.30, duplicate line character fraction
  * 0.20): lines are the `sep`-separated segments of the text (trailing
  * empties preserved, exactly like `split(text, "\n")`), a duplicate is
  * every occurrence of a line value BEYOND its first, and the char
  * fraction counts the code points of those beyond-first occurrences.
  * Counting rides the same hash-keyed, exact-verified [[GramTable]] as
  * the n-gram expressions (lines are 1-grams of the line array): no
  * per-row string map, O(n_lines) fixed-size slots.
  *
  * Output struct (integers): n_lines, total_chars (code points of the
  * whole text), dup_lines, dup_chars. Null text → null. One codegen'd
  * pass per row, zero exchanges — a document's own lines never need a
  * shuffle (the CORPUS-frequency line filter is
  * [[graft.dedup.Dedup.stripLinesIndexed]]'s job; this is the
  * within-document signal).
  */
case class DupLineStats(child: Expression, sep: String = "\n")
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(sep.nonEmpty && sep.forall(_ < 128),
    s"sep must be a non-empty ASCII string (got '$sep')")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("total_chars", IntegerType, nullable = false),
    StructField("dup_lines", IntegerType, nullable = false),
    StructField("dup_chars", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    DupLineStats.compute(input.asInstanceOf[UTF8String], sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("lineSep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DupLineStats.compute($c, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DupLineStats =
    copy(child = newChild)
}

/** Shared byte-level segment splitting on an ASCII separator SEQUENCE
  * (non-overlapping, leftmost-first — exactly `split(text, sep)` /
  * DuckDB `string_split` with a literal separator), preserving empties.
  * ASCII bytes never occur inside multi-byte UTF-8 sequences, so the
  * byte scan splits on true character boundaries.
  */
private[functions] object SegmentSplit {
  def split(bytes: Array[Byte], sep: Array[Byte]): Array[UTF8String] = {
    val n = bytes.length
    val m = sep.length
    var count = 1
    var i = 0
    while (i + m <= n) {
      if (matchesAt(bytes, sep, i)) { count += 1; i += m } else i += 1
    }
    val segs = new Array[UTF8String](count)
    var start = 0
    var si = 0
    i = 0
    while (i <= n) {
      if (i + m <= n && matchesAt(bytes, sep, i)) {
        segs(si) = UTF8String.fromBytes(bytes, start, i - start)
        si += 1
        i += m
        start = i
      } else if (i == n) {
        segs(si) = UTF8String.fromBytes(bytes, start, i - start)
        si += 1
        i += 1
      } else i += 1
    }
    segs
  }

  @inline private def matchesAt(bytes: Array[Byte], sep: Array[Byte], i: Int): Boolean = {
    var j = 0
    while (j < sep.length) {
      if (bytes(i + j) != sep(j)) return false
      j += 1
    }
    true
  }
}

object DupLineStats {
  def compute(text: UTF8String, sep: String): org.apache.spark.sql.catalyst.InternalRow = {
    val lines = SegmentSplit.split(text.getBytes,
      sep.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val nLines = lines.length
    val table = new GramTable(lines, 1, nLines)
    var i = 0
    while (i < nLines) { table.add(i); i += 1 }
    var dupLines = 0
    var dupChars = 0
    var s = 0
    while (s < table.capacity) {
      val first = table.slotFirst(s)
      if (first >= 0) {
        val extra = table.slotCount(s) - 1
        if (extra > 0) {
          dupLines += extra
          dupChars += extra * lines(first).numChars()
        }
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nLines, text.numChars(), dupLines, dupChars))
  }
}

/** Within-document keep-first line dedup — the REMOVAL action paired
  * with [[DupLineStats]]' signal (C4-style cleanup: navigation menus and
  * cookie banners repeat inside one page; the first occurrence stays,
  * the repeats go): lines are the `sep`-separated segments (empties
  * preserved), each line VALUE keeps its first occurrence in original
  * order, and every later occurrence is dropped. One pass on the
  * hash-keyed exact-verified [[GramTable]] (add() returns the running
  * occurrence count, so detection and reassembly share the pass);
  * returns struct(clean_text, n_lines, n_removed) — the same shape as
  * the corpus-frequency filter [[StripLinesByHash]], because pipelines
  * chain the two. Null text → null; zero state, zero exchanges.
  */
case class DedupLinesInDoc(child: Expression, sep: String = "\n")
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(sep.nonEmpty && sep.forall(_ < 128),
    s"sep must be a non-empty ASCII string (got '$sep')")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    DedupLinesInDoc.compute(input.asInstanceOf[UTF8String], sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("lineSep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DedupLinesInDoc.compute($c, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupLinesInDoc =
    copy(child = newChild)
}

object DedupLinesInDoc {
  def compute(text: UTF8String, sep: String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val sepBytes = sep.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val lines = SegmentSplit.split(bytes, sepBytes)
    val nLines = lines.length
    val table = new GramTable(lines, 1, nLines)
    // dedup can only shrink: input bytes bound the rebuild buffer
    val out = new Array[Byte](bytes.length)
    var outLen = 0
    var kept = 0
    var li = 0
    while (li < nLines) {
      if (table.add(li) == 1) {
        if (kept > 0) {
          System.arraycopy(sepBytes, 0, out, outLen, sepBytes.length)
          outLen += sepBytes.length
        }
        val seg = lines(li)
        seg.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + outLen)
        outLen += seg.numBytes()
        kept += 1
      }
      li += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen)),
      nLines, nLines - kept))
  }
}

/** TRUE iff any element of a string-array column is a member of the
  * broadcast [[SortedHashPairs]] index — the per-row membership probe
  * behind [[graft.operators.Blocklist.filterBlockedBroadcast]] (host
  * dot-suffixes vs a blocklist) and any other bounded string-set filter
  * that must run with ZERO shuffle (streams, map-side pre-filters).
  * Same structure discipline as [[StripLinesByHash]]: the index is
  * decoded once per operator instance and binary-searched per element
  * (h2 computed only on an h1 hit); identity is the two-seed 128-bit
  * hash, so a false positive needs a 128-bit collision. Null array →
  * null; null elements never match.
  */
case class AnyHashInIndex(child: Expression,
    index: org.apache.spark.broadcast.Broadcast[SortedHashPairs])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val sorted: SortedHashPairs = index.value

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      AnyHashInIndex.compute(input.asInstanceOf[ArrayData], sorted))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("hashIndex", index,
      "org.apache.spark.broadcast.Broadcast")
    val sortedVar = ctx.addMutableState("graft.functions.SortedHashPairs",
      "hashSorted", v => s"$v = (graft.functions.SortedHashPairs) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AnyHashInIndex.compute($c, $sortedVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnyHashInIndex =
    copy(child = newChild)
}

object AnyHashInIndex {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def compute(arr: ArrayData, hot: SortedHashPairs): Boolean = {
    val h1s = hot.h1
    val h2s = hot.h2
    if (h1s.length == 0) return false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, 42L)
        var j = java.util.Arrays.binarySearch(h1s, h1)
        if (j >= 0) {
          val h2 = XXH64.hashUTF8String(s, SortedHashPairs.Seed2)
          while (j > 0 && h1s(j - 1) == h1) j -= 1
          while (j < h1s.length && h1s(j) == h1) {
            if (h2s(j) == h2) return true
            j += 1
          }
        }
      }
      i += 1
    }
    false
  }
}
