package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PACKED symbol-sequence form shared by the tokenizer trainers/encoders
  * (r20 optimization): a word's symbol array `[s1, s2, ...]` packs to the
  * string `"<M>s1<M><M>s2<M>...<M>sk<M>"` — every symbol WRAPPED in one
  * marker char on each side. The BPE/WordPiece leftmost-first
  * non-overlapping merge of an adjacent pair (a, b) is then EXACTLY one
  * literal string `replace` of `"<M>a<M><M>b<M>"` with `"<M>merged<M>"`:
  *
  *  - boundary-safe BOTH sides: a symbol that merely ends with `a` cannot
  *    match (`a` needs its own opening marker right before it), and a
  *    symbol that merely STARTS with `b` cannot either (`b` needs its own
  *    closing marker right after it — a single-sided form fails exactly
  *    here: in [an, an, a] the pair (an, a) would match the prefix `a` of
  *    the second `an`);
  *  - leftmost-first, non-overlapping, resuming AFTER the replacement —
  *    `replace`'s scan order — which is exactly the fold semantics of the
  *    array form, INCLUDING consecutive occurrences: each occurrence owns
  *    its symbols' complete wrappers, so [a,b,a,b] → [ab,ab] and
  *    [a,a,a] with (a,a) → [aa,a];
  *  - no re-merge cascade: the replacement `<M>merged<M>` cannot seed a new
  *    occurrence of `<M>a<M><M>b<M>` — `merged` strictly extends `a`, so
  *    `merged != a`, and the fold likewise only compares whole symbols.
  *
  * Why: the array mergeFold is a Catalyst higher-order `aggregate` whose
  * per-element slice+concat copies make it O(len²) interpreted work per
  * word PER MERGE STEP (HigherOrderFunctions are CodegenFallback);
  * `replace` is a codegen'd O(len) scan (guide §4: prefer codegen'd
  * built-ins in the hot path). Symbol COUNTS derived from either form are
  * identical, so trainer argmaxes and encoder token counts are unchanged —
  * pinned by the trainer/encoder reference specs AND SymPackSpec's direct
  * fold-vs-packed property sweep.
  *
  * Validity: the packing is unambiguous iff no SYMBOL contains the marker
  * char. Initial alphabets are corpus-derived (single chars / `##`-forms /
  * hex byte pairs), so [[dirty]] tests exactly that; callers route dirty
  * words through the original array fold (trainers: one cached-scan check
  * then a full fallback; encoders: a per-row `when`), keeping results
  * exact on ANY input while the packed path serves the clean ~100%. */
object SymPack {

  /** Marker char: U+0001 — outside every trainer alphabet in practice;
    * [[dirty]] guards the exception. */
  val M = "\u0001"

  /** Pack a symbol array into its marker-wrapped string form:
    * `M s1 M M s2 M ... M sk M`. */
  def pack(syms: Column): Column =
    concat(lit(M), array_join(syms, M + M), lit(M))

  /** True iff packing `syms` would be ambiguous (a symbol contains the
    * marker). */
  def dirty(syms: Column): Column = exists(syms, s => s.contains(M))

  /** Unpack back to the symbol array: trim the outermost markers, split on
    * the double-marker separators. */
  def unpack(ms: Column): Column =
    split(ms.substr(lit(2), length(ms) - 2), M + M)

  /** One leftmost-first non-overlapping merge of adjacent (a, b) into
    * `merged` on the packed form — the codegen'd twin of the array fold. */
  def mergeStep(ms: Column, a: String, b: String, merged: String): Column =
    replace(ms, lit(M + a + M + M + b + M), lit(M + merged + M))

  /** Symbol count of a packed form without materializing the array: each
    * symbol carries exactly two marker chars. */
  def packedSize(ms: Column): Column =
    ((length(ms) - length(replace(ms, lit(M)))) / 2).cast("long")

  /** Adjacent-pair structs of an UNPACKED symbol array (shared shape of the
    * trainer pair counts). */
  def adjacentPairs(arr: Column): Column =
    zip_with(
      slice(arr, lit(1), size(arr) - 1),
      slice(arr, lit(2), size(arr) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
}
