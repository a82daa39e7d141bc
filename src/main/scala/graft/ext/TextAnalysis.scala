package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality metrics, stopword ratios, a deterministic
  * language-ID heuristic, and document fingerprinting. All pure `Column`
  * expressions (codegen'd, no UDFs) so they pipeline inside whole-stage
  * codegen over a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace tokenization — the "BPE-ish" splitter is a regex on
    * whitespace runs; swap the pattern for a subword regex when a real
    * tokenizer vocabulary is available.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Characters per token — a cheap fluency signal. Raw quotient, no
    * round(): the operands are integers on every engine, so the IEEE
    * division is bit-identical, while round() algorithms differ on exact
    * halves (which terminating quotients hit often).
    */
  def avgTokenLength(text: Column): Column =
    length(text).cast("double") / tokenCount(text)

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("long")

  /** Fraction of tokens that are stopwords — high values suggest natural
    * prose, near-zero suggests tables/code/boilerplate.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text)

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
      length(text)

  /** Marker-token language-ID heuristic: count language-specific stopword
    * hits per candidate language, pick the argmax with a fixed tie-break
    * order (es > de > en > und). A real system would use character n-gram
    * profiles; the decision structure (N scores -> argmax) is identical.
    */
  val enMarkers = Seq("the", "a", "of", "and")
  val esMarkers = Seq("el", "la", "los", "las", "de")
  val deMarkers = Seq("der", "die", "das", "und")

  def languageId(text: Column): Column = {
    val en = stopwordCount(text, enMarkers)
    val es = stopwordCount(text, esMarkers)
    val de = stopwordCount(text, deMarkers)
    when(es > en && es > de, "es")
      .when(de > en && de >= es, "de")
      .when(en > 0, "en")
      .otherwise("und")
  }

  /** Content fingerprint: md5 of the case/whitespace-normalized text.
    * Stable across engines (md5 is bit-exact everywhere), usable as an
    * exact-dedup key at any scale.
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))
}
