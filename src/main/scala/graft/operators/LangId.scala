package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification: stopword-profile voting + script
  * (character-class) detection, expressed entirely with codegen'd
  * built-ins (array_intersect over token sets, regexp counts). Linear
  * scan, no shuffle — safe at any corpus size.
  */
object LangId {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "was",
      "for", "with", "are", "be", "this", "have", "not", "you", "they"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los",
      "las", "por", "con", "para", "es", "su", "del", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein",
      "eine", "mit", "auf", "für", "von", "zu", "den", "dem", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pour",
      "que", "dans", "qui", "pas", "sur", "avec", "au", "ce", "il"))

  /** Per-language stopword hit counts + CJK char count. */
  def scores(textCol: Column): Map[String, Column] = {
    val toks = array_distinct(split(lower(trim(textCol)), graft.queries.Tables.Ws))
    profiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    } + ("zh" -> length(regexp_replace(textCol, "[^\\u4e00-\\u9fff]", "")))
  }

  /** Predicted language column ("und" when nothing matches). */
  def predict(textCol: Column): Column = {
    val s = scores(textCol)
    // zh wins on any CJK presence; otherwise the best stopword profile
    val latin = Seq("en", "es", "de", "fr")
    val best = latin.map(l => struct(s(l).as("score"), lit(l).as("lang")))
    val top = array_max(array(best: _*))
    when(s("zh") > 0, lit("zh"))
      .when(top.getField("score") > 0, top.getField("lang"))
      .otherwise(lit("und"))
  }

  def withLanguage(df: DataFrame, textCol: String,
      outCol: String = "lang_pred"): DataFrame =
    df.withColumn(outCol, predict(col(textCol)))
}
