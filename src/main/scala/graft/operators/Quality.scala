package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.TextFunctions.let1

/** Document-quality filter rules in the style of the Gopher heuristics
  * (Rae et al. 2021, "Scaling Language Models", §A1.1 — public paper):
  * per-document repetition statistics plus simple well-formedness ratios.
  * Together with [[graft.functions.TextFunctions]] these are the standard
  * pre-training corpus filters (C4/Gopher/RefinedWeb family).
  *
  * Two kinds of rules live here:
  *   - **Scalar rules** ([[meanWordLength]], [[alphaWordRatio]],
  *     [[symbolWordRatio]], [[duplicateLineCharFraction]],
  *     [[bulletOrEllipsisLineFraction]]) are pure column algebra — one
  *     projection inside whole-stage codegen, no shuffle, scan pruning
  *     intact. Line rules are quadratic in the *line* count of a document
  *     (fine: web documents have tens of lines, and the work is per-row,
  *     embarrassingly parallel).
  *   - **N-gram repetition** ([[ngramRepetition]]) needs per-(doc, gram)
  *     occurrence counts, so it explodes grams and aggregates keyed by
  *     document — work linear in corpus token count, shuffles keyed on
  *     (doc, gram) (never a global key), so it scales exactly like the
  *     wordcount family in [[Corpus]].
  *
  * The reference engine has no text layer (scalar surface:
  * `jscodegen/JSCodeGenerator.scala`); this is beyond-parity training-data
  * surface.
  */
object Quality {

  /** Mean token length in characters (0.0 for empty documents). */
  def meanWordLength(text: Column): Column = let1(TextFunctions.tokens(text)) { t =>
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (a, w) => a + length(w)).cast("double")
        / size(t).cast("double"))
  }

  /** Fraction of tokens containing at least one ASCII letter (Gopher keeps
    * documents where >= 80% of words have an alphabetic character).
    */
  def alphaWordRatio(text: Column): Column = let1(TextFunctions.tokens(text)) { t =>
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, w => w.rlike("[A-Za-z]"))).cast("double")
        / size(t).cast("double"))
  }

  /** Symbol-to-word ratio: occurrences of the Gopher symbol set
    * (`#`, `...`, `…`) per token. An ASCII ellipsis counts once however
    * long the dot run is.
    */
  def symbolWordRatio(text: Column): Column = let1(TextFunctions.tokens(text)) { t =>
    val hashes = size(split(text, "#", -1)) - 1
    val asciiEll = size(split(text, "\\.{3,}", -1)) - 1
    val uniEll = size(split(text, "…", -1)) - 1
    when(size(t) === 0, lit(0.0))
      .otherwise((hashes + asciiEll + uniEll).cast("double") / size(t).cast("double"))
  }

  /** Non-empty lines of a document (trailing whitespace stripped). */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => rtrim(l)), l => length(l) > 0)

  /** Fraction of characters contained in lines whose exact text occurs more
    * than once in the document (Gopher "duplicate line character fraction").
    * Quadratic in the line count of one document — per-row compute only.
    */
  def duplicateLineCharFraction(text: Column): Column = let1(lines(text)) { ls =>
    val total = aggregate(ls, lit(0L), (a, l) => a + length(l))
    val dupChars = aggregate(ls, lit(0L), (a, l) =>
      a + when(size(filter(ls, x => x === l)) > 1, length(l)).otherwise(0L))
    when(total === 0, lit(0.0)).otherwise(dupChars.cast("double") / total.cast("double"))
  }

  /** Fraction of lines starting with a bullet or ending with an ellipsis
    * (Gopher drops documents where > 90% of lines start with a bullet or
    * > 30% end with "...").
    */
  def bulletOrEllipsisLineFraction(text: Column): Column = let1(lines(text)) { ls =>
    val hits = size(filter(ls, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ") ||
        l.endsWith("...") || l.endsWith("…")))
    when(size(ls) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(ls).cast("double"))
  }

  /** Per-document word n-gram repetition statistics (Gopher §A1.1):
    * one row per input document with
    *   - `top_ngram_char_frac`: characters covered by occurrences of the
    *     single most frequent n-gram, as a fraction of total token
    *     characters (ties broken by the lexicographically smallest gram;
    *     overlapping occurrences may double-count, so the value is clamped
    *     to 1.0 — same convention as the paper's released reimplementations);
    *   - `dup_ngram_char_frac`: fraction of token characters lying inside
    *     at least one n-gram that occurs more than once (position-coverage
    *     union — each character counted once).
    * Documents shorter than `n` tokens score 0.0 on both.
    *
    * Character totals count token characters only (whitespace excluded), so
    * the metric is layout-invariant like the tokenizer.
    *
    * Scale shape: grams are exploded (generator, no shuffle) and counted
    * keyed by (doc, gram) with map-side partial aggregation; every later
    * join/aggregate is keyed by the document id. Nothing global, nothing
    * quadratic: corpus cost is O(total tokens), the classic wordcount
    * profile.
    */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val id = col(idCol)
    val base = df.select(id,
        TextFunctions.tokens(col(textCol)).as("g_toks"))
      .withColumn("g_total",
        aggregate(col("g_toks"), lit(0L), (a, w) => a + length(w)))
      .withColumn("g_m", size(col("g_toks")))

    // (doc, pos, gram, gramChars): one row per n-gram occurrence
    val grams = base
      .filter(col("g_m") >= n)
      .select(id, col("g_total"),
        explode(transform(sequence(lit(1), col("g_m") - (n - 1)),
          i => struct(i.as("pos"),
            concat_ws(" ", slice(col("g_toks"), i, lit(n))).as("ng"),
            aggregate(slice(col("g_toks"), i, lit(n)), lit(0L),
              (a, w) => a + length(w)).as("ngc")))).as("g"))
      .select(id, col("g_total"), col("g.pos").as("g_pos"),
        col("g.ng").as("g_ng"), col("g.ngc").as("g_ngc"))

    // ONE shuffle keyed (doc, gram) serves both downstream consumers:
    // occurrence counts ride with their position lists (map-side partial
    // aggregation collapses the exploded frame before the exchange), so
    // neither a window over the raw gram stream nor a second
    // position-carrying shuffle is needed
    val occ = grams
      .groupBy(id, col("g_ng"))
      .agg(count(lit(1)).as("g_cnt"), first("g_ngc").as("g_ngc"),
        first("g_total").as("g_total"),
        collect_list(col("g_pos")).as("g_poss"))

    // most frequent gram per doc (count desc, gram asc) — the window runs
    // over the already-aggregated per-gram frame
    val top = occ
      .withColumn("g_rk", row_number().over(Window.partitionBy(id)
        .orderBy(col("g_cnt").desc, col("g_ng").asc)))
      .filter(col("g_rk") === 1)
      .select(id,
        least(lit(1.0), (col("g_cnt") * col("g_ngc")).cast("double")
          / col("g_total").cast("double")).as("top_ngram_char_frac"))

    // char-position coverage union of duplicated grams: explode each
    // duplicated gram's positions into token positions, dedup per doc, then
    // sum the token lengths at the covered positions
    val coveredPos = occ.filter(col("g_cnt") > 1)
      .select(id, explode(col("g_poss")).as("g_pos"))
      .select(id, explode(sequence(col("g_pos"), col("g_pos") + (n - 1))).as("g_p"))
      .distinct()
    val posLens = base.select(id, posexplode(col("g_toks")).as(Seq("g_p0", "g_w")))
      .select(id, (col("g_p0") + 1).as("g_p"), length(col("g_w")).as("g_l"))
    val dup = coveredPos.join(posLens, Seq(idCol, "g_p"))
      .groupBy(idCol).agg(sum("g_l").as("g_cov"))

    base.select(id, col("g_total"))
      .join(top, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(id,
        coalesce(col("top_ngram_char_frac"), lit(0.0)).as("top_ngram_char_frac"),
        coalesce(when(col("g_total") > 0,
            col("g_cov").cast("double") / col("g_total").cast("double")),
          lit(0.0)).as("dup_ngram_char_frac"))
  }
}
