package graft.functions

import graft.SparkSpec

/** Goldens ported from the reference's `tests/unit/test_cleaners.py:17-103`
  * and `tests/fixtures/sample_data.json` (titles_to_clean /
  * companies_to_clean).
  */
class CleanersSpec extends SparkSpec {

  private def title(s: String): String =
    evalStr(Cleaners.cleanTitle, s).asInstanceOf[String]
  private def company(s: String): String = Cleaners.cleanCompanyNameImpl(s)

  // --- clean_title: fixture golden pairs (sample_data.json) ---
  test("title golden: salary suffix removed") {
    assert(title("Senior Python Developer - Thu Nhập Upto 40 Triệu") ==
      "Senior Python Developer")
  }
  test("title golden: space before parenthesis") {
    assert(title("Backend Developer(Java, Spring Boot)") ==
      "Backend Developer (Java, Spring Boot)")
  }
  test("title golden: C++ preserved, location suffix removed") {
    assert(title("C++ Developer - Tại Hà Nội") == "C++ Developer")
  }
  test("title golden: .NET preserved, pipe salary removed") {
    assert(title(".NET Developer | Lương 30 Triệu") == ".NET Developer")
  }

  // --- clean_title: unit tests (test_cleaners.py) ---
  test("title removes salary info") {
    val r = title("Senior Python Developer - Thu Nhập Upto 40 Triệu")
    assert(!r.contains("Thu Nhập") && !r.contains("40 Triệu"))
    assert(r.contains("Senior Python Developer"))
  }
  test("title removes location suffix") {
    val r = title("Backend Developer - Tại Hà Nội")
    assert(!r.contains("Tại Hà Nội") && r.contains("Backend Developer"))
  }
  test("title preserves C#") {
    assert(title("C# Developer").contains("C#"))
  }
  test("title handles empty and null") {
    assert(title("") == "")
    assert(title(null) == "")
  }
  test("title strips special characters but keeps ()/-.$,:") {
    assert(title("Chuyên Viên Kinh Doanh @ Hà Nội!") == "Chuyên Viên Kinh Doanh Hà Nội")
    // reference's step-3 comma rule inserts a space inside "$2,000" too
    assert(title("Dev (Java/Scala) - $2,000") == "Dev (Java/Scala) - $2, 000")
  }
  test("title adds space after colon and comma") {
    assert(title("Urgent:Java,Python Dev") == "Urgent: Java, Python Dev")
  }
  test("title keeps Vietnamese diacritics (Unicode \\w)") {
    assert(title("Kỹ Sư Phần Mềm") == "Kỹ Sư Phần Mềm")
  }
  test("title en-dash variant removed") {
    assert(title("Data Engineer – Lương Cao") == "Data Engineer")
  }

  // --- clean_company_name: fixture golden pairs ---
  test("company golden: tnhh fpt") {
    assert(company("công ty tnhh fpt software") == "Công Ty TNHH FPT Software")
  }
  test("company golden: CP AI recased") {
    assert(company("CÔNG TY CP CÔNG NGHỆ AI") == "Công Ty CP Công Nghệ AI")
  }
  test("company golden: recruitment keyword removed") {
    assert(company("vng corporation tuyển dụng") == "Vng Corporation")
  }

  // --- clean_company_name: unit tests ---
  test("company capitalizes words") {
    assert(company("công ty abc").head.isUpper)
  }
  test("company preserves abbreviations") {
    assert(company("công ty tnhh abc").contains("TNHH"))
  }
  test("company preserves tech words") {
    assert(company("công ty it solutions").contains("IT"))
  }
  test("company removes recruitment keywords") {
    assert(!company("ABC Company tuyển dụng").toLowerCase.contains("tuyển dụng"))
  }
  test("company handles empty and null") {
    assert(company("") == "")
    assert(company(null) == "")
  }
  test("company removes extra spaces") {
    assert(!company("Công  Ty   ABC").contains("  "))
  }
  test("company keeps CamelCase words") {
    assert(company("TechCorp việt nam") == "TechCorp Việt Nam")
  }
  test("company uppercases digit-led tokens") {
    assert(company("công ty 3m việt nam") == "Công Ty 3M Việt Nam")
  }
  test("company Column API matches impl") {
    assert(evalStr(Cleaners.cleanCompanyName, "công ty tnhh fpt software") ==
      "Công Ty TNHH FPT Software")
  }
}
