package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text featurization for activity clustering — the reference's 3-dim
  * feature vector (reference: jobs/clustering/UnusualActivityDetectionJob
  * .scala:421-450: tokenize on `[\s,.;]+`; features = 10 × distinct-token
  * ratio, ALL-CAPS-token ratio, 4-letter-token ratio; empty text → zero
  * vector).
  *
  * Expressed as built-in higher-order functions (codegen'd, shuffle-free)
  * with a DuckDB-SQL twin for oracle checking.
  */
object TextFeatures {

  /** Filtered token array of a text column (the tokenization step). */
  def toks(text: Column): Column =
    filter(split(text, "[\\s,.;]+"), t => length(t) > 0)

  /** 3-dim feature vector from a PRE-PROJECTED [[toks]] attribute.
    * Project the tokens first: higher-order functions are CodegenFallback
    * (no common-subexpression elimination), so an inlined tokenization is
    * re-evaluated once per derived measure — 6 splits/row in the one-shot
    * form (q36 measured the same pattern at ~3× query cost). */
  def featurizeToks(t: Column): Column = {
    val n = size(t)
    when(n === 0, array(lit(0.0), lit(0.0), lit(0.0)))
      .otherwise(array(
        size(array_distinct(t)).cast("double") / n.cast("double") * 10.0,
        size(filter(t, x => x === upper(x) && x =!= lower(x))).cast("double") / n.cast("double"),
        size(filter(t, x => length(x) === 4)).cast("double") / n.cast("double")))
  }

  /** One-shot form for contexts that cannot pre-project (prefer
    * [[toks]] + [[featurizeToks]] on hot paths). */
  def featurize(text: Column): Column = featurizeToks(toks(text))

  /** DuckDB twin of [[featurize]] over a text expression (3 columns f0..f2,
    * rounded to `nd` decimals to absorb engine float-printing drift). */
  def sqlFeatures(text: String, nd: Int): Seq[String] = {
    val toks = s"list_filter(regexp_split_to_array($text, '[\\s,.;]+'), t -> len(t) > 0)"
    Seq(
      s"round(CASE WHEN len($toks) = 0 THEN 0.0::DOUBLE ELSE len(list_distinct($toks))::DOUBLE / len($toks)::DOUBLE * 10.0::DOUBLE END, $nd) AS f0",
      s"round(CASE WHEN len($toks) = 0 THEN 0.0::DOUBLE ELSE len(list_filter($toks, t -> t = upper(t) AND t <> lower(t)))::DOUBLE / len($toks)::DOUBLE END, $nd) AS f1",
      s"round(CASE WHEN len($toks) = 0 THEN 0.0::DOUBLE ELSE len(list_filter($toks, t -> len(t) = 4))::DOUBLE / len($toks)::DOUBLE END, $nd) AS f2")
  }
}
