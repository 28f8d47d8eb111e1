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

  /** 3-dim feature vector of a text column as array<double>. */
  def featurize(text: Column): Column = {
    val toks = filter(split(text, "[\\s,.;]+"), t => length(t) > 0)
    val n = size(toks)
    when(n === 0, array(lit(0.0), lit(0.0), lit(0.0)))
      .otherwise(array(
        size(array_distinct(toks)).cast("double") / n.cast("double") * 10.0,
        size(filter(toks, t => t === upper(t) && t =!= lower(t))).cast("double") / n.cast("double"),
        size(filter(toks, t => length(t) === 4)).cast("double") / n.cast("double")))
  }

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
