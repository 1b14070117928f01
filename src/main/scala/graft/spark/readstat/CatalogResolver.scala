package graft.spark.readstat

import java.util.concurrent.ConcurrentHashMap

import graft.core.sas.SasCatalog

/** Resolves the `catalog` read option (reference `_normalize_catalog`,
  * polars_readstat/__init__.py:439-451): a path to a `.sas7bcat` file, or
  * — the string-option analog of the reference's pre-built
  * `{format: {code: label}}` dict — an inline spec
  * `REGIONF:1=East;2=West|$SEXF:M=Male;F=Female`.
  *
  * Inline codes that parse as numbers land in the numeric map; EVERY code
  * also lands in the string map, so a char column whose codes happen to
  * look numeric still matches (the reference's single mixed-key dict
  * behaves the same way: matching is by the column's own type).
  */
object CatalogResolver {

  private val inlineCache = new ConcurrentHashMap[String, SasCatalog.Catalog]()

  def resolve(spec: String): SasCatalog.Catalog =
    if (new java.io.File(spec).isFile) SasModule.catalog(spec)
    else inlineCache.computeIfAbsent(spec, parseInline)

  /** Normalize a column's display format to a catalog key: uppercase,
    * strip the trailing width digits and periods (e.g. "regionf8." →
    * REGIONF, "$sexf8." → $SEXF) — the same normalization the catalog
    * reader applies to block names. */
  def fmtKey(format: String): String =
    format.toUpperCase.reverse.dropWhile(c => c.isDigit || c == '.').reverse

  private def parseInline(spec: String): SasCatalog.Catalog = {
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"catalog: '$spec' is neither an existing .sas7bcat file nor a valid " +
        s"inline spec (FORMAT:code=Label;code=Label|FORMAT2:...) — $why")
    if (!spec.contains(":") || !spec.contains("=")) bad("no ':' / '=' found")
    val numeric = Map.newBuilder[String, Map[Double, String]]
    val string = Map.newBuilder[String, Map[String, String]]
    spec.split("\\|", -1).foreach { fmtSpec =>
      val colon = fmtSpec.indexOf(':')
      if (colon <= 0) bad(s"missing format name before ':' in '$fmtSpec'")
      val name = fmtKey(fmtSpec.substring(0, colon).trim)
      if (name.isEmpty || name == "$") bad(s"empty format name in '$fmtSpec'")
      val pairs = fmtSpec.substring(colon + 1).split(";", -1).toSeq.map { p =>
        val eq = p.indexOf('=')
        if (eq <= 0) bad(s"missing 'code=Label' in '$p'")
        p.substring(0, eq).trim -> p.substring(eq + 1)
      }
      val nums = pairs.flatMap { case (c, l) => c.toDoubleOption.map(_ -> l) }
      if (nums.nonEmpty && !name.startsWith("$")) numeric += name -> nums.toMap
      string += name -> pairs.toMap
    }
    SasCatalog.Catalog(numeric.result(), string.result())
  }
}
