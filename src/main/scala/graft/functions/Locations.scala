package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Location parsing (F6) — fully native split/transform/filter chain, no
  * UDF and no Generator: the caller `explode`s the returned array.
  *
  * Reference: `src/etl/warehouse/dimensions/location.py:36-87` —
  * `parse_location` splits on " & ", drops "nơi khác"/empty parts, maps
  * foreign countries to ('Unknown', country) and Vietnamese cities to
  * (normalized_city, 'Vietnam') where normalization appends " (mới)" to
  * merged provinces (2025 administrative reform) and leaves not-merged
  * provinces and unknown strings as-is.
  */
object Locations {

  /** `location.py:14-20` */
  val MergedProvinces: Seq[String] = Seq(
    "Tuyên Quang", "Lào Cai", "Thái Nguyên", "Phú Thọ", "Bắc Ninh",
    "Hưng Yên", "Hải Phòng", "Ninh Bình", "Quảng Trị", "Đà Nẵng",
    "Quảng Ngãi", "Gia Lai", "Khánh Hòa", "Lâm Đồng", "Đắk Lắk",
    "Hồ Chí Minh", "Đồng Nai", "Tây Ninh", "Cần Thơ", "Vĩnh Long",
    "Đồng Tháp", "Cà Mau", "An Giang")

  /** `location.py:23-26` */
  val NotMergedProvinces: Seq[String] = Seq(
    "Hà Nội", "Huế", "Lai Châu", "Điện Biên", "Sơn La", "Lạng Sơn",
    "Quảng Ninh", "Thanh Hóa", "Nghệ An", "Hà Tĩnh", "Cao Bằng")

  /** `location.py:29-33` */
  val ForeignCountries: Seq[String] = Seq(
    "Nước Ngoài", "Nhật Bản", "Hàn Quốc", "Đài Loan", "Singapore",
    "Malaysia", "Thái Lan", "Trung Quốc", "Mỹ", "Úc", "Đức", "Pháp",
    "Anh", "Canada", "Japan", "Korea", "Taiwan", "USA", "Australia")

  private def inList(values: Seq[String], c: Column): Column =
    c.isin(values.map(_.asInstanceOf[Any]): _*)

  /** `normalize_city_name` (`location.py:36-54`) as a native expression. */
  def normalizeCity(city: Column): Column = {
    val trimmed = trim(city)
    val base = trim(regexp_replace(trimmed, "\\s\\(mới\\)", ""))
    when(inList(NotMergedProvinces, base), base)
      .when(inList(MergedProvinces, base), concat(base, lit(" (mới)")))
      .otherwise(trimmed)
  }

  /** F6: `parse_location(str)` → `array<struct<city:string,country:string>>`.
    * Empty array for null-ish input (caller can explode without losing the
    * row via `explode_outer` if needed).
    */
  def parseLocations(c: Column): Column = {
    val s = trim(c.cast("string"))
    val emptyOut = array().cast("array<struct<city:string,country:string>>")
    val pair = (city: Column, country: Column) =>
      struct(city.as("city"), country.as("country"))
    val parts = transform(split(s, " & "), p => trim(p))
    val kept = filter(parts, p =>
      !(lower(p).contains("nơi khác") || p === "" ||
        lower(p).isin("nan", "none")))
    val mapped = transform(kept, p =>
      when(inList(ForeignCountries, p), pair(lit("Unknown"), p))
        .otherwise(pair(normalizeCity(p), lit("Vietnam"))))
    when(c.isNull || lower(s).isin("", "nan", "none", "null"), emptyOut)
      .when(inList(ForeignCountries, s), array(pair(lit("Unknown"), s)))
      .otherwise(mapped)
  }
}
