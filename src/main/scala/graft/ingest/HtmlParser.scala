package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.util.matching.Regex

/** HTML job-card parser (S2).
  *
  * Reference: `src/data_sources/topcv/parser.py:109-254` with the selector
  * config in `src/config/parser_config.py`. The container has no HTML
  * library (zero-egress, Spark jars only), so this is a regex extractor
  * mirroring the reference's PRIMARY selectors (`div.job-item*` cards,
  * `data-job-id`, `h3.title a`, `a.company`, `label.address`,
  * `label.title-salary`, `div.skills label.item`, `label.time strong`,
  * `span.vip-badge`, `label.deadline`, logo `img src`) — resilient to
  * attribute order and quoting, not to arbitrary HTML. Parsing runs as a
  * `flatMap` over pages: one task per page batch, no driver loops, stats
  * via one aggregation over null flags (the reference's per-field
  * extraction stats).
  */
object HtmlParser {

  case class RawJob(
    job_id: String, title: String, job_url: String,
    company_name: String, company_url: String,
    salary: String, skills: Seq[String], location: String,
    deadline: String, verified_employer: Boolean,
    last_update: String, logo_url: String)

  private val jobItem: Regex =
    """(?s)<div[^>]*class="[^"]*job-item[^"]*"[^>]*>.*?(?=<div[^>]*class="[^"]*job-item[^"]*"[^>]*>|\z)""".r
  private val dataJobId: Regex = """data-job-id="(\d+)"""".r
  private val idFromHref: Regex = """-(\d+)\.html""".r
  private val titleBlock: Regex =
    """(?s)<h3[^>]*class="[^"]*title[^"]*"[^>]*>\s*<a[^>]*href="([^"]*)"[^>]*>(.*?)</a>""".r
  private val origTitle: Regex = """data-original-title="([^"]*)"""".r
  private val companyA: Regex =
    """(?s)<a[^>]*class="[^"]*company[^"]*"[^>]*href="([^"]*)"[^>]*>(.*?)</a>""".r
  private val addressLabel: Regex =
    """(?s)<label[^>]*class="[^"]*address[^"]*"[^>]*>(.*?)</label>""".r
  private val salaryLabel: Regex =
    """(?s)<label[^>]*class="[^"]*title-salary[^"]*"[^>]*>(.*?)</label>""".r
  private val skillItem: Regex =
    """(?s)<label[^>]*class="[^"]*item[^"]*"[^>]*>(.*?)</label>""".r
  private val skillExtra: Regex = """data-original-title="([^"<]*)"""".r
  private val deadlineStrong: Regex =
    """(?s)<label[^>]*class="[^"]*time[^"]*"[^>]*>.*?<strong[^>]*>(.*?)</strong>""".r
  private val vipBadge: Regex = """class="[^"]*(?:vip-badge|verified)[^"]*"""".r
  private val updateLabel: Regex =
    """(?s)<label[^>]*class="[^"]*deadline[^"]*"[^>]*>(.*?)</label>""".r
  private val logoImg: Regex = """<img[^>]*src="([^"]*)"""".r

  /** Tag strip + the common entity decodes BeautifulSoup's get_text
    * performs (an `&amp;`-separated location must split on " & "). */
  private def stripTags(s: String): String =
    s.replaceAll("(?s)<[^>]*>", " ")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
      .replaceAll("\\s+", " ").trim

  private def absolutize(href: String): String =
    if (href.startsWith("/")) s"https://www.topcv.vn$href" else href

  /** Extract one card — None when required fields (numeric job_id, title)
    * are missing, like `parser.py:216-218`.
    */
  def extractJob(card: String): Option[RawJob] = {
    val jobId = dataJobId.findFirstMatchIn(card).map(_.group(1))
      .orElse(idFromHref.findFirstMatchIn(card).map(_.group(1)))
    val tb = titleBlock.findFirstMatchIn(card)
    val title = tb.map { m =>
      origTitle.findFirstMatchIn(m.group(2)).map(_.group(1))
        .getOrElse(stripTags(m.group(2)))
    }.filter(_.nonEmpty)
    if (jobId.isEmpty || !jobId.get.matches("\\d+") || title.isEmpty) return None

    val comp = companyA.findFirstMatchIn(card)
    val skills = skillItem.findAllMatchIn(card).flatMap { m =>
      val text = stripTags(m.group(1))
      if (text.endsWith("+"))
        skillExtra.findFirstMatchIn(m.group(0)).toSeq
          .flatMap(_.group(1).split(",")).map(_.trim).filter(_.nonEmpty)
      else if (text.nonEmpty) Seq(text) else Seq.empty
    }.toSeq.distinct

    Some(RawJob(
      job_id = jobId.get,
      title = title.get,
      job_url = tb.map(m => absolutize(m.group(1))).orNull,
      company_name = comp.map(m => stripTags(m.group(2))).orNull,
      company_url = comp.map(m => absolutize(m.group(1))).orNull,
      salary = salaryLabel.findFirstMatchIn(card).map(m => stripTags(m.group(1))).orNull,
      skills = skills,
      location = addressLabel.findFirstMatchIn(card).map(m => stripTags(m.group(1))).orNull,
      deadline = deadlineStrong.findFirstMatchIn(card).map(m => stripTags(m.group(1))).orNull,
      verified_employer = vipBadge.findFirstIn(card).isDefined,
      last_update = updateLabel.findFirstMatchIn(card).map(m => stripTags(m.group(1))).orNull,
      logo_url = logoImg.findFirstMatchIn(card).map(_.group(1)).orNull))
  }

  /** Parse a page of HTML into job rows (first-seen wins per job_id within
    * a page, `parser.py:239-245`).
    */
  def parsePage(html: String): Seq[RawJob] = {
    val jobs = jobItem.findAllIn(html).flatMap(extractJob).toSeq
    val seen = scala.collection.mutable.Set[String]()
    jobs.filter(j => seen.add(j.job_id))
  }

  /** DataFrame surface: `htmlPages` must have a string column `html`
    * (e.g. from `spark.read.option("wholetext", true).text(dir)`).
    */
  def parseJobs(htmlPages: DataFrame): DataFrame = {
    val spark = htmlPages.sparkSession
    import spark.implicits._
    htmlPages.select(col("html").cast("string")).as[String]
      .flatMap(parsePage _)
      .toDF()
  }

  /** Per-field extraction-success stats (`parser.py` _record_stat) as one
    * aggregation. */
  def extractionStats(jobs: DataFrame): DataFrame = {
    def rate(c: String) =
      round(count(when(col(c).isNotNull, 1)).cast("double") / count(lit(1)), 4).as(s"${c}_rate")
    jobs.agg(count(lit(1)).as("total"),
      rate("company_name"), rate("location"), rate("salary"),
      rate("deadline"), rate("last_update"), rate("logo_url"))
  }
}
