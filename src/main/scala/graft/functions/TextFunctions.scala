package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline operators
  * (SURVEY.md §2.B UDF surface): tokenization, n-gram shingles,
  * MinHash signatures, SimHash, fingerprints, quality metrics,
  * language-ID heuristics.
  *
  * Everything is composed from built-in (codegen'd) Catalyst
  * expressions — `split`, `transform`, `aggregate`, `xxhash64` — so
  * the hot path stays inside whole-stage codegen and distributes
  * without a UDF serialization boundary.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style ("BPE-ish") pre-tokenizer pattern: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation
    * runs. RE2-compatible (no lookahead) so the DuckDB oracle applies
    * the identical pattern. */
  final val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+"

  /** BPE-ish pre-tokens (whitespace runs are skipped, not emitted). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Whitespace-normalized, lowercased canonical form. */
  def normalized(text: Column): Column = lower(regexp_replace(trim(text), "\\s+", " "))

  /** Content-addressed document fingerprint (md5 of canonical form).
    * Exact-duplicate groups share a fingerprint; at 100 TB this is the
    * groupBy key for exact dedup (fixed 32-byte key instead of full text).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** SHA-256 content hash (collision-safe exact-dup key). */
  def contentSha(text: Column): Column = sha2(text, 256)

  /** Word n-gram shingles: `["a b c", "b c d", ...]` from the token
    * array (native single-pass expression, see [[WordShingles]]). */
  def shingles(text: Column, n: Int): Column = WordShingles(tokens(text), n)

  /** Built-ins-only shingles (interpreted per position; kept as the
    * composition reference). */
  def shinglesHof(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /** MinHash signature: signature element j = min over shingles of a
    * lane-j hash. Two documents' signatures agree at position j with
    * probability = Jaccard similarity of their shingle sets. Native
    * single-pass expression (see [[MinHashSignature]]); the pure
    * higher-order-function composition is kept as
    * [[minhashSignatureHof]] for reference.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    MinHashSignature(shingleArr, k)

  /** Built-ins-only MinHash (interpreted per element — ~40x slower in
    * the sf0.1 near-dup pipeline; use [[minhashSignature]]). */
  def minhashSignatureHof(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleArr, sh => xxhash64(sh, seed))))

  /** LSH band keys from a MinHash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature slots. Documents sharing any
    * band key are near-dup candidates; the band key is the shuffle key
    * that makes near-dedup a distributed equi-join instead of O(n^2).
    */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)), j))

  /** Bit masks 1L<<63 .. 1L<<0, MSB first. */
  private val simhashMasks: Column = typedlit((63 to 0 by -1).map(i => 1L << i))

  /** 64-bit SimHash over the token multiset: per bit position, sum +1
    * for tokens whose hash has the bit set, -1 otherwise; the sign of
    * the sum is the output bit. Near-identical documents differ in few
    * bits (Hamming distance), so bucketing by bit-blocks finds
    * near-dups at scale. Evaluated by the native [[SimHash64]]
    * expression (one fused loop per row; the original 64-lane HOF fold
    * cost q17 5.5 s at sf0.1), bit-identical to the HOF composition.
    */
  def simhash64(text: Column): Column = SimHash64(tokens(text))

  /** The HOF composition, kept as the executable reference spec for
    * [[SimHash64]] (FunctionsSpec asserts bit-identity). */
  def simhash64Hof(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val counts = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(1), lit(64)), j =>
          when(h.bitwiseAND(element_at(simhashMasks, j)) =!= 0, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    // pack MSB-first: shiftleft wraps at bit 63 (unlike `acc*2`, which
    // throws under ANSI mode when the sign bit fills)
    aggregate(counts, lit(0L), (acc, c) =>
      shiftleft(acc, 1).bitwiseOR(when(c > 0, lit(1L)).otherwise(lit(0L))))
  }

  /** Hamming distance between two 64-bit signatures: popcount of XOR
    * via the native codegen'd `bit_count` — one expression instead of
    * a 64-lane interpreted HOF fold (the q17 candidate-verify hot
    * path). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Stable content-hash bucket in [0, n): first 4 hex chars of
    * md5(content) as an integer, mod n. The train/holdout split
    * invariant lives HERE — q43 (corpus split), q51 (stratified
    * split), and the DuckDB oracle's `('0x'||substr(md5(x),1,4))::BIGINT
    * % n` must all agree on the 4-hex-char derivation. */
  def stableBucket(content: Column, n: Int): Column = {
    require(n > 0)
    conv(substring(md5(content), 1, 4), 16, 10).cast("long") % n
  }

  /** Jaccard similarity of the distinct-token sets of two documents. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(tokens(a))
    val tb = array_distinct(tokens(b))
    size(array_intersect(ta, tb)).cast("double") / size(array_union(ta, tb)).cast("double")
  }

  // ---- PII redaction ---------------------------------------------------

  /** RE2-compatible PII patterns (no lookaround, so the DuckDB oracle
    * runs the identical regex). Pattern order matters in [[redactPii]]:
    * emails first (an email is not a URL substring), then URLs
    * (greedy to whitespace), then phone numbers. */
  final val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val UrlPattern   = "https?://[^\\s]+"
  final val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Mask emails/URLs/phone numbers with typed placeholder tokens —
    * the scrubbing step of a training-data pipeline. Three codegen'd
    * regexp_replace passes; one row-local scan each, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      PhonePattern, "<PHONE>")

  /** Count of non-overlapping matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  // ---- quality metrics -------------------------------------------------

  def charCount(text: Column): Column = length(text).cast("long")

  /** Mean token length = non-whitespace chars / token count. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") / tokenCount(text)

  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text)

  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text)

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()]", "")).cast("double") / length(text)

  /** Distinct-token / total-token ratio: low values flag repetitive
    * (low-quality / boilerplate) documents. */
  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)
}
