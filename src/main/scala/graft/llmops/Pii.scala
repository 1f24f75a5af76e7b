package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over text columns (north-star X4 extension):
  * the scrubbing pass every training-data pipeline runs before release
  * (emails, phone numbers, IP addresses, card numbers), expressed as
  * codegen'd `regexp_extract_all` / `regexp_replace` scans —
  * shuffle-free, one pass per document, no UDFs.
  *
  * Pattern dialect: Spark compiles Java regex, the DuckDB oracle
  * compiles RE2. Every pattern here is restricted to the COMMON SUBSET
  * (character classes, bounded repetition, `\b` word boundaries; no
  * lookaround, no backreferences) so the oracle states the exact same
  * pattern string and both engines find the exact same matches — the
  * portability contract that makes redaction hash-checkable.
  *
  * Redaction replaces each class with an angle-bracket placeholder
  * (`<EMAIL>`/`<CARD>`/`<PHONE>`/`<IP>`). Placeholders contain no
  * characters any pattern can match, so redaction is idempotent
  * (spec-pinned), and the classes are replaced in a fixed,
  * longest-pattern-first order — email → card → phone → IP — so both
  * engines resolve overlapping candidates identically and the most
  * sensitive/widest span wins an overlap. Detection counts are
  * per-class over the ORIGINAL text and therefore independent of
  * redaction order; a span counted by two classes (e.g. a phone run
  * flowing into a card run across a shared digit group) is redacted by
  * the earlier class, and the later class's residue — no longer a
  * complete match — stays as plain digits. Sequential per-class
  * replacement cannot resolve such overlaps symmetrically; ordering
  * card before phone bounds the worst residue at a partial phone
  * prefix instead of 12 live card digits.
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

  /** Dotted-quad IPv4 literals. */
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Dashed 16-digit card numbers (4-4-4-4). A phone (3-3-4) can never
    * match INSIDE a card — the only `\b` anchors in a card sit after
    * each dash, and no 3-digit group followed by a dash starts there —
    * and [[ipRe]] uses dots, not dashes. A phone CAN however end on the
    * digit group a card begins with ("555-123-4567-1111-1111-1111":
    * phone ends at "4567", card starts there), which is why [[redact]]
    * replaces cards BEFORE phones (see the object doc's overlap note).
    */
  val cardRe = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"

  /** Non-overlapping match count of `re` in `text` (left-to-right, the
    * same enumeration Java regex and RE2 both implement).
    */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** All four class counts as named columns, for a per-doc signal row. */
  def signals(text: Column): Seq[Column] = Seq(
    countMatches(text, emailRe).as("n_email"),
    countMatches(text, phoneRe).as("n_phone"),
    countMatches(text, ipRe).as("n_ip"),
    countMatches(text, cardRe).as("n_card"))

  /** Redact all four classes, fixed longest-first order:
    * email → card → phone → IP (overlap rationale in the object doc).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailRe, "<EMAIL>"),
          cardRe, "<CARD>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
}
