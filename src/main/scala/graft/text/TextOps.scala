package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (north-star components beyond the reference — BASELINE.json: dedup,
  * text analysis, fingerprinting over the `documents` table).
  *
  * Everything is a composition of built-in, codegen'd array/string
  * functions — no UDFs, so the whole token pipeline stays inside
  * whole-stage codegen and runs per-row with zero shuffles. All hashing is
  * md5-hex based (lowercase hex is identical across engines), which makes
  * every derived signature exactly reproducible by the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokenization. The corpus is single-space separated; a real
    * corpus would pass a regex splitter here instead.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical text normalization — the pass a training-data pipeline
    * runs BEFORE tokenizing or deduping, so that encoding-level variants
    * (NFD vs NFC accents, case, zero-width characters, whitespace runs)
    * of the same content collide instead of slipping past every
    * signature: NFC compose (native [[graft.funcs.NfcNormalize]]) →
    * case-fold → strip zero-width/BOM code points → collapse whitespace
    * runs to one space → trim. Per-row, zero shuffles; each step mirrors
    * one DuckDB function (`nfc_normalize`/`lower`/`regexp_replace` with
    * 'g'), which is what makes [[graft.queries.DataOps.normalizeText]]
    * oracle-gradable. The whitespace class is spelled explicitly because
    * Java's `\s` and RE2's differ on VT (U+000B).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(graft.funcs.NfcNormalize(text)),
        "[\u200B\u200C\u200D\uFEFF]", ""),
      "[ \t\n\r\f]+", " "))

  /** Distinct word n-gram shingles of a token array; empty array when the
    * doc has fewer than n tokens. Per-row work with no shuffle, compiled:
    * binds the native [[graft.funcs.WordShingles]] expression (the
    * equivalent `array_distinct(transform(sequence(...)))` chain is
    * CodegenFallback and dominated the dedup operators' runtime).
    */
  def shingles(w: Column, n: Int): Column = graft.funcs.WordShingles(w, n)

  /** One MinHash value: the minimum md5 hex digest of `salt:shingle` over
    * the shingle set. Lexicographic min over a uniform hash is a valid
    * min-wise permutation; hex strings compare identically everywhere.
    */
  def minhash(sh: Column, salt: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$salt:"), s))))

  /** k independent MinHash signature columns mh0..mh{k-1}, computed in
    * one native pass ([[graft.funcs.MinHashSig]]) and unpacked — the
    * per-j [[minhash]] fold is the executable specification.
    */
  def minhashSig(sh: Column, k: Int): Seq[Column] = {
    val sig = graft.funcs.MinHashSig(sh, k)
    (0 until k).map(j => element_at(sig, j + 1).as(s"mh$j"))
  }

  /** LSH band digests over a k=b*r signature: band b hashes rows
    * [b*r, b*r+r). Docs agreeing on any band become candidates — candidate
    * generation is a shuffle on (band, digest), never an all-pairs join.
    */
  def lshBands(b: Int, r: Int): Seq[Column] =
    (0 until b).map { band =>
      md5(concat((0 until r).map(j => col(s"mh${band * r + j}")): _*)).as(s"band$band")
    }

  /** 16-bit token hash: the first 4 hex digits of md5(salt || token) as an
    * int. `conv` base-16 → base-10 matches the oracle's per-digit
    * arithmetic exactly for valid hex.
    */
  def tokenHash16(salt: String, t: Column): Column =
    conv(substring(md5(concat(lit(salt), t)), 1, 4), 16, 10).cast("int")

  /** 32-bit token hash (first 8 hex digits of md5) as a long — the
    * SimHash feature hash width.
    */
  def tokenHash32(salt: String, t: Column): Column =
    conv(substring(md5(concat(lit(salt), t)), 1, 8), 16, 10).cast("long")
}
