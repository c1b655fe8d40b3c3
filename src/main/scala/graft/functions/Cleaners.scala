package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Title / company-name cleaning (F1, F2).
  *
  * Reference: `src/etl/staging/cleaners.py:26-80` (clean_title) and
  * `:83-122` (clean_company_name). Java regex needs the `(?U)` flag to make
  * `\w`/`\b` Unicode-aware like Python's `re` (Vietnamese diacritics must
  * stay word characters — SURVEY.md §7.5-7), and `(?iu)` for
  * case-insensitive matching over non-ASCII.
  *
  * clean_title is a pure native `regexp_replace` chain (codegen'd, no UDF);
  * clean_company_name needs per-word branching against lookup sets → one
  * Scala UDF (SURVEY.md §7.4).
  */
object Cleaners {

  /** Tech words kept fully uppercase (`cleaners.py:6-17`). */
  val TechWords: Set[String] = Set(
    "PHP", "JAVA", "PYTHON", "AWS", "SQL", "HTML", "CSS", "JS", "UI", "UX",
    "AI", "ML", "IOS", "API", "IT", "CNTT", "REACT", "VUE", "ANGULAR", "NODE",
    "DEVOPS", "QA", "BA", "PM", "HR", "ERP", "CRM", "SAP", "BTP", "CAP",
    "NET", "GO", "RUST", "KOTLIN", "SWIFT", "FLUTTER", "DART",
    "NODEJS", "NEXTJS", "REACTJS", "VUEJS", "TYPESCRIPT", "JAVASCRIPT",
    "MONGODB", "MYSQL", "POSTGRESQL", "REDIS", "DOCKER", "K8S", "KUBERNETES",
    "GIT", "CI", "CD", "GCP", "AZURE", "IOT", "MEP", "HVAC", "BIM",
    "ODOO", "LARAVEL", "SPRING", "SPRINGBOOT", "DJANGO", "FLASK", "FASTAPI",
    "MSB", "SI", "LG", "CNS", "MISA", "FPT", "VIETTEL", "VNPT", "IS", "IEC",
    "ABI", "DNSE", "BRSE", "SQA")

  /** Company abbreviations kept uppercase (`cleaners.py:20-23`). */
  val CompanyAbbr: Set[String] = Set(
    "TNHH", "CP", "CPĐT", "JSC", "LLC", "INC", "LTD", "CO", "CORP",
    "BPO", "IT", "AI", "IOT", "ERP", "CRM")

  /** Salary/location tail patterns stripped from titles (`cleaners.py:34-51`). */
  private val RemovePatterns: Seq[String] = Seq(
    "\\s*[-–]\\s*Thu Nhập.*$",
    "\\s*[-–]\\s*Upto.*$",
    "\\s*[-–]\\s*Up to.*$",
    "\\s*[-–]\\s*Salary.*$",
    "\\s*[-–]\\s*Lương.*$",
    "\\s*[-–]\\s*Tại\\s+(Hà Nội|HCM|Hồ Chí Minh|Đà Nẵng).*$",
    "\\s*[-–]\\s*Từ\\s+\\d+.*$",
    "\\s*[-–]\\s*Tối Thiểu.*$",
    "\\s*\\[Hà Nội\\].*$",
    "\\s*\\[HCM\\].*$",
    "\\s*\\[Hồ Chí Minh\\].*$",
    "\\s*\\|\\s*Thu Nhập.*$",
    "\\s*\\|\\s*Lương.*$",
    "\\s+Thu Nhập Từ\\s+\\d+.*$",
    "\\s+Lương Upto.*$",
    "\\s+Onboard Sau Tết.*$")

  /** F1: clean_title as a native expression chain (`cleaners.py:26-80`). */
  def cleanTitle(c: Column): Column = {
    val base = trim(coalesce(c.cast("string"), lit("")))
    val removed = RemovePatterns.foldLeft(base) { (acc, p) =>
      regexp_replace(acc, "(?iu)" + p, "")
    }
    val spaced = regexp_replace(
      regexp_replace(
        regexp_replace(removed, "(?U)(\\w)\\(", "$1 ("),
        "(?U):(\\w)", ": $1"),
      "(?U),(\\w)", ", $1")
    val protectd = regexp_replace(
      regexp_replace(spaced, "C\\+\\+", "___CPLUSPLUS___"),
      "C#", "___CSHARP___")
    val stripped = regexp_replace(protectd, "(?U)[^\\w\\s()/\\-.$,:]", " ")
    val restored = regexp_replace(
      regexp_replace(stripped, "___CPLUSPLUS___", "C++"),
      "___CSHARP___", "C#")
    val dotnet = regexp_replace(restored, "(?iu)\\.NET\\b", ".NET")
    trim(regexp_replace(dotnet, "\\s+", " "))
  }

  /** F2 core, callable directly in unit tests (`cleaners.py:83-122`). */
  def cleanCompanyNameImpl(name: String): String = {
    if (name == null || name.isEmpty) return ""
    var n = name.trim
    n = n.replaceAll("(?U)[^\\w\\s()\\[\\]\\-/.,&+#]", " ")
    n = n.replaceAll("\\s+", " ").trim
    for (p <- Seq("\\btuyển\\s+dụng\\b", "\\bcần\\s+tuyển\\b",
                  "\\bđang\\s+tuyển\\b", "\\bhot\\b", "\\bgấp\\b"))
      n = n.replaceAll("(?iU)" + p, "")
    val words = n.split("\\s+").filter(_.nonEmpty)
    val recased = words.map { w =>
      val up = w.toUpperCase
      if (CompanyAbbr(up) || TechWords(up)) up
      else if (w.matches("^[A-Z][a-z]+[A-Z].*")) w            // CamelCase kept
      else if (w.matches("(?U)^\\d+\\w*$")) w.toUpperCase     // digit-led tokens
      else if (w.length > 1) w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase
      else w.toUpperCase
    }
    n = recased.mkString(" ").trim
    n = n.replaceAll("\\bCông TY\\b", "Công Ty")
    n = n.replaceAll("\\bNgân HÀNG\\b", "Ngân Hàng")
    n.replaceAll("\\s+", " ").trim
  }

  /** F2: clean_company_name as a Column (Scala UDF — token-level branching
    * against the broadcast word sets is not expressible natively).
    */
  def cleanCompanyName(c: Column): Column = {
    val u = udf((s: String) => cleanCompanyNameImpl(s))
    u(c.cast("string"))
  }
}
