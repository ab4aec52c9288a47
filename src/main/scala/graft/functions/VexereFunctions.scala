package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native `Column` ports of the reference's three Python scalar UDFs and
  * two CASE cascades (to_silver.py:16-75,117-128; to_gold.py:35-40).
  *
  * All are pure `Column => Column` folds of built-in functions, so they
  * stay inside whole-stage codegen and keep predicate pushdown —
  * replacing the reference's Python-UDF serialization boundary (SURVEY.md
  * §2.9, §4.1).
  *
  * Regex fidelity notes (SURVEY.md §7.4):
  *  - Python 3 `\b`/`\w` are Unicode-aware by default; Java's are
  *    ASCII-only unless the pattern enables `(?U)`
  *    (UNICODE_CHARACTER_CLASS). Every `\b` pattern here carries `(?U)`
  *    so e.g. `tt` adjacent to a Vietnamese letter is NOT treated as a
  *    word boundary, matching Python.
  *  - Python replacement groups `\2` become Java `$2`.
  *  - Error→null semantics of the Python UDFs are preserved: these
  *    expressions null-propagate and never throw on malformed input
  *    (sessions run with `spark.sql.ansi.enabled=false`, see
  *    graft.core.GraftSession).
  */
object VexereFunctions {

  /** The Vietnamese lowercase letter set kept by the normalizer
    * (to_silver.py:54). */
  private val VietChars =
    "áàảãạăắằẳẵặâấầẩẫậéèẻẽẹêếềểễệíìỉĩịóòỏõọôốồổỗộơớờởỡợúùủũụưứừửữựýỳỷỹỵđ"

  /** Abbreviation expansions, applied in order (to_silver.py:21-39). */
  private val Replacements: Seq[(String, String)] = Seq(
    """(?U)\b(q([0-9]+))\b""" -> "quận $2",
    """(?U)(?<=\w)(ql\s*([0-9]+[a-z]?))\b""" -> " quốc lộ $2",
    """(?U)\b(ql\s*([0-9]+[a-z]?))\b""" -> "quốc lộ $2",
    """(?U)\btp\b""" -> "thành phố",
    """(?U)\bvp\b""" -> "văn phòng",
    """(?U)\bkcn\b""" -> "khu công nghiệp",
    """(?U)\bhcm\b""" -> "hồ chí minh",
    """(?U)\bbx\b""" -> "bến xe",
    """(?U)\btx\b""" -> "thị xã",
    """(?U)\bsg\b""" -> "sài gòn",
    """(?U)\bubnd\b""" -> "uỷ ban nhân dân",
    """(?U)\btt\b""" -> "",
    """(?U)\bcd\b""" -> "")

  /** Specific fixups, applied after the expansions (to_silver.py:41-47). */
  private val SpecificReplacements: Seq[(String, String)] = Seq(
    """(?U)\bsai gon nga tư ga\b""" -> "sài gòn ngã 4 ga",
    """(?U)\bsai gon\b""" -> "sài gòn",
    """(?U)\bngã tư an sươngquốc lộ 1a\b""" -> "ngã tư an sương quốc lộ 1a",
    """sg sài gòn""" -> "sài gòn",
    """sài gòn sài gòn""" -> "sài gòn")

  /** Vietnamese place-name normalization (to_silver.py:16-59):
    * lowercase → abbreviation expansion → fixups → strip chars outside
    * [a-z0-9 whitespace Vietnamese] → collapse whitespace → trim. */
  def standardizeVn(c: Column): Column = {
    val expanded = (Replacements ++ SpecificReplacements)
      .foldLeft(lower(c)) { case (acc, (pat, repl)) => regexp_replace(acc, pat, repl) }
    val stripped =
      regexp_replace(expanded, s"(?iu)[^a-z0-9\\s$VietChars]", "")
    trim(regexp_replace(stripped, """\s+""", " "))
  }

  /** "10h30m"-style duration → decimal hours (to_silver.py:61-69).
    * Python uses re.match (anchored at the start), so the pattern is
    * `^`-anchored here; no-match → null. Quirk preserved: "45m" parses
    * as 45 *hours* (the `\d+` group is the hour group). */
  def durationHours(c: Column): Column = {
    val pat = """^(\d+)h?(\d*)m?"""
    val h = regexp_extract(c, pat, 1)
    val m = regexp_extract(c, pat, 2)
    when(h === "", lit(null).cast(DoubleType))
      .otherwise(h.cast(DoubleType) +
        when(m === "", lit(0.0)).otherwise(m.cast(DoubleType) / 60.0))
  }

  /** "150.000đ" → 150000 (to_silver.py:71-75). Empty/digitless → null. */
  def priceVnd(c: Column): Column = {
    val cleaned = regexp_replace(c, "[^0-9]", "")
    when(c.isNull || c === "" || cleaned === "", lit(null).cast(IntegerType))
      .otherwise(cleaned.cast(IntegerType))
  }

  /** [[priceVnd]] at DECIMAL(12,0) instead of INT (SURVEY.md §1.3's
    * "Decimal worth adding for prices at scale"): VND prices overflow
    * Int32 past ~2.1 billion đ, and SUM/AVG over a 100 TB fact table
    * overflows exact Double (2^53) long before that — decimal keeps
    * both the column and its aggregates exact. Same cleaning and
    * null semantics as [[priceVnd]]; values beyond 12 digits → null
    * (non-ANSI decimal overflow), like the Int path's overflow→null. */
  def priceVndDecimal(c: Column): Column = {
    val cleaned = regexp_replace(c, "[^0-9]", "")
    when(c.isNull || c === "" || cleaned === "",
      lit(null).cast(DecimalType(12, 0)))
      .otherwise(cleaned.cast(DecimalType(12, 0)))
  }

  /** 9-branch LIKE cascade classifying a (lowercased) Type_Bus into
    * Bus_Type_Category (to_silver.py:117-128). */
  def busTypeCategory(typeBusLower: Column): Column = {
    val t = typeBusLower
    when(t.like("%giường nằm%") && !t.like("%limousine%"), "giường nằm")
      .when(t.like("%huyndai solati 11 chỗ%"), "limousine ghế ngồi")
      .when(t.like("%limousine%") && t.like("%ghế ngồi%"), "limousine ghế ngồi")
      .when(t.like("%limousine%") && t.like("%giường nằm có wc%"), "limousine giường nằm có WC")
      .when(t.like("%limousine%") && (t.like("%giường nằm%") || t.like("%giường%")), "limousine giường nằm")
      .when(t.rlike("""limousine.*[0-9]+\s*chỗ"""), "limousine giường nằm")
      .when(t.like("%phòng%"), "limousine giường phòng")
      .when(t.like("%ghế ngồi%"), "ghế ngồi")
      .otherwise("khác")
  }

  /** The BACKFILL variant of the cascade (all_run/to_silver-all.py:
    * 173-185) — the reference's bulk-reprocess job carries an extended
    * 11-branch classifier that differs from the daily one in three
    * deliberate ways, all preserved:
    *  - branch 5 keeps Python's `&`-over-`|` precedence as written:
    *    `(limousine AND giường nằm) OR giường` — a bare "giường" bus
    *    classifies as limousine here, unlike the daily job's
    *    `limousine AND (giường nằm OR giường)`;
    *  - a dedicated branch for "limousine giường phòng có WC";
    *  - the giường-phòng branch is `(limousine AND giường phòng) OR
    *    phòng`, same precedence quirk.
    */
  def busTypeCategoryBackfill(typeBusLower: Column): Column = {
    val t = typeBusLower
    when(t.like("%giường nằm%") && !t.like("%limousine%"), "giường nằm")
      .when(t.like("%huyndai solati 11 chỗ%"), "limousine ghế ngồi")
      .when(t.like("%limousine%") && t.like("%ghế ngồi%"), "limousine ghế ngồi")
      .when(t.like("%limousine%") && t.like("%giường nằm có wc%"), "limousine giường nằm có WC")
      .when((t.like("%limousine%") && t.like("%giường nằm%")) || t.like("%giường%"), "limousine giường nằm")
      .when(t.rlike("""limousine.*[0-9]+\s*chỗ"""), "limousine giường nằm")
      .when(t.like("%limousine%") && t.like("%giường phòng có wc%"), "limousine giường phòng có WC")
      .when((t.like("%limousine%") && t.like("%giường phòng%")) || t.like("%phòng%"), "limousine giường phòng")
      .when(t.like("%ghế ngồi%"), "ghế ngồi")
      .otherwise("khác")
  }

  /** "HH:mm" departure time → dayband label (to_gold.py:35-40); null /
    * unparseable → null (no ELSE branch in the reference CASE). */
  def dayband(departureTime: Column): Column = {
    val h = hour(to_timestamp(departureTime, "HH:mm"))
    when(h.between(0, 5), "00h-05h")
      .when(h.between(6, 11), "06h-11h")
      .when(h.between(12, 17), "12h-17h")
      .when(h.between(18, 23), "18h-23h")
  }
}
