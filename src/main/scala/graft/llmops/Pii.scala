package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over text columns (north-star X4 extension):
  * the scrubbing pass every training-data pipeline runs before release
  * (emails, card numbers, international and NANP phone numbers, IPv6 and
  * IPv4 addresses), expressed as codegen'd `regexp_extract_all` /
  * `regexp_replace` scans — shuffle-free, one pass per document, no UDFs.
  *
  * Pattern dialect: Spark compiles Java regex, the DuckDB oracle
  * compiles RE2. Every pattern here is restricted to the COMMON SUBSET
  * (character classes, bounded repetition, alternation, `\b` word
  * boundaries; no lookaround, no backreferences) so the oracle states
  * the exact same pattern string and both engines find the exact same
  * matches — the portability contract that makes redaction
  * hash-checkable. Both engines implement leftmost-first matching with
  * greedy preference and earlier-alternative preference, so even the
  * alternation in [[ipv6Re]] resolves identically.
  *
  * Redaction replaces each class with an angle-bracket placeholder.
  * Placeholders contain no characters any pattern can match, so a
  * replacement can only DESTROY candidate matches, never create one
  * (neighbors of a replaced span cannot juxtapose through the non-empty
  * non-digit placeholder) — which makes the full chain idempotent and
  * the redacted output match-free for every class
  * ([[graft.PiiSpec]] pins both as a ScalaCheck property).
  *
  * Classes are replaced in a fixed, longest/most-sensitive-first order —
  * email → card → intl phone → NANP phone → IPv6 → IPv4 — so both
  * engines resolve overlapping candidates identically and the widest
  * span wins an overlap. Detection counts are per-class over the
  * ORIGINAL text and therefore independent of redaction order; a span
  * counted by two classes (e.g. a phone run flowing into a card run
  * across a shared digit group) is redacted by the earlier class, and
  * the later class's residue — no longer a complete match — stays as
  * plain digits. Sequential per-class replacement cannot resolve such
  * overlaps symmetrically; ordering card before the phone classes bounds
  * the worst residue at a partial phone prefix instead of 12 live card
  * digits, and ordering intl before NANP lets the `+CC` form take the
  * whole span rather than stranding a dangling `+CC-`.
  *
  * At 100 TB: these are per-row projections inside whole-stage codegen —
  * they fuse with whatever scan/filter surrounds them, shuffle nothing,
  * and scale embarrassingly. The cost is the regex automaton per row,
  * linear in text length.
  */
object Pii {

  /** Email addresses (practical form, not full RFC 5321). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style dashed phone numbers (NNN-NNN-NNNN). */
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** International `+`-prefixed phone numbers: `+CC` (1–3 digits) then
    * three digit groups (1–4, 3–4, 3–4) with single space or dash
    * separators — covers `+1-555-123-4567`, `+44 20 7946 0958`,
    * `+81 3 1234 5678`-style forms. Deliberately requires all three
    * groups; run-together forms (`+442079460958`) are out of the
    * supported subset (an unanchored digit-run pattern would swallow
    * arbitrary numeric text).
    */
  val intlPhoneRe = "\\+\\d{1,3}[ -]\\d{1,4}[ -]\\d{3,4}[ -]\\d{3,4}\\b"

  /** Dotted-quad IPv4 literals. */
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** IPv6 literals, hex-group forms: the full 8-group form, or a
    * `::`-compressed form with at least one group on each side of the
    * `::` (`2001:db8::1`, `2001:db8::8a2e:370:7334`). Leftmost-first
    * alternation order (full form first) is identical in Java regex and
    * RE2. Out of the subset, documented: leading/trailing `::` forms
    * (`::1`, `fe80::`) and the dotted-quad tail of IPv4-mapped addresses
    * (`::ffff:1.2.3.4` — the quad is still caught by [[ipRe]]); both
    * need the bare `::` shorthand, whose empty-side `\b` anchoring is
    * not expressible without lookaround.
    */
  val ipv6Re =
    "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b|" +
      "\\b(?:[0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}\\b"

  /** Dashed 16-digit card numbers (4-4-4-4). A NANP phone (3-3-4) can
    * never match INSIDE a card — the only `\b` anchors in a card sit
    * after each dash, and no 3-digit group followed by a dash starts
    * there — and [[ipRe]] uses dots, not dashes. A phone CAN however end
    * on the digit group a card begins with
    * ("555-123-4567-1111-1111-1111": phone ends at "4567", card starts
    * there), which is why [[redact]] replaces cards BEFORE both phone
    * classes (see the object doc's overlap note).
    */
  val cardRe = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"

  /** One detected class: short name (signal column is `n_<name>`), the
    * shared Java∩RE2 pattern, and the redaction placeholder.
    */
  final case class PiiClass(name: String, re: String, tag: String)

  /** The classes IN REDACTION ORDER — the single source of truth shared
    * by [[signals]], [[redact]], [[redactLocal]] and the SQL
    * `pii_redact` builder ([[graft.GraftExtensions]]), so no surface can
    * drift from another. Order rationale in the object doc.
    */
  val classes: Seq[PiiClass] = Seq(
    PiiClass("email", emailRe, "<EMAIL>"),
    PiiClass("card", cardRe, "<CARD>"),
    PiiClass("intl", intlPhoneRe, "<INTL>"),
    PiiClass("phone", phoneRe, "<PHONE>"),
    PiiClass("ipv6", ipv6Re, "<IPV6>"),
    PiiClass("ip", ipRe, "<IP>"))

  /** Non-overlapping match count of `re` in `text` (left-to-right, the
    * same enumeration Java regex and RE2 both implement).
    */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** All class counts as named columns (`n_email` … `n_ip`), for a
    * per-doc signal row. Counted over the original text, so independent
    * of redaction order.
    */
  def signals(text: Column): Seq[Column] =
    classes.map(c => countMatches(text, c.re).as(s"n_${c.name}"))

  /** Redact all classes in the fixed order of [[classes]]. */
  def redact(text: Column): Column =
    classes.foldLeft(text)((c, p) => regexp_replace(c, p.re, p.tag))

  /** Driver-side twin of [[redact]]: the same patterns through the same
    * `java.util.regex` automaton Spark's `RegExpReplace` executes
    * (placeholders contain no `$`/`\` so `replaceAll`'s replacement
    * escaping cannot diverge). [[graft.PiiSpec]] pins Spark ≡ local on a
    * generated batch, then property-tests idempotence and order totality
    * against this twin at ScalaCheck volume.
    */
  def redactLocal(text: String): String =
    classes.foldLeft(text)((s, p) => s.replaceAll(p.re, p.tag))
}
