package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused pii_scrub expression to the 4-call reference chain it
  * replaced — two `regexp_extract_all` counts on the raw string plus the
  * sequential `regexp_replace(regexp_replace(raw, email), phone)` — on
  * exactly the boundary cases where a naive single-alternation rewrite
  * diverges:
  *
  *  - a phone embedded INSIDE an email span ("555-66@x.yy"): the raw
  *    count sees both, the replaced text shows only <EMAIL>;
  *  - a phone directly AFTER an email with no separator ("a@b.cc555-1"):
  *    invisible to the raw phone count (no word boundary after the TLD
  *    letter), but the email replacement's '>' CREATES the boundary, so
  *    the sequential chain redacts it — and so must the fused pass;
  *  - a phone directly BEFORE an email-like tail ("555-12.a@b.cc"):
  *    the email pattern starts at-or-before the phone start (its
  *    local-part charset is a superset), so email consumption wins.
  */
class PiiScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b555-[0-9]+\\b"

  private val cases = Seq(
    "plain text, no pii at all",
    "contact user7@example.com or call 555-7 now",
    "two mails a@b.cc and c.d@e-f.org plus 555-123 and 555-9",
    // phone inside an email span: counted on raw, absent from clean
    "reach 555-66@x.yy today",
    // replacement-created boundary: phone hidden in raw, exposed after <EMAIL>
    "weird a@b.cc555-1 tail",
    // phone then email-charset tail: email starts at the same position
    "price 555-12.a@b.cc quoted",
    // adjacent emails, empty gap
    "a@b.cc c@d.ee",
    // boundaries at string edges
    "555-1",
    "x@y.zz",
    "",
    "ends with 555-42",
    "555-5 starts it",
    "dots.and+plus_chars%ok@sub.domain.co end",
    "no-at-sign 555abc 555- 555 -555-3x")

  test("fused pii_scrub equals the sequential 4-call chain on every edge case") {
    import spark.implicits._
    val df = cases.toDF("raw")
    val got = df.select(
      PiiScrub.piiScrub($"raw").as("p"), $"raw")
      .select($"raw", $"p.n_emails", $"p.n_phones", $"p.clean_text")
    val ref = df.select($"raw",
      size(regexp_extract_all($"raw", lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all($"raw", lit(phoneRe), lit(0))).as("n_phones"),
      regexp_replace(regexp_replace($"raw", emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("clean_text"))
    val g = got.collect().map(_.toString).sorted.toSeq
    val r = ref.collect().map(_.toString).sorted.toSeq
    assert(g == r, s"fused scrub drifted from the reference chain:\n" +
      got.except(ref).collect().mkString("\n") + "\n-- vs --\n" +
      ref.except(got).collect().mkString("\n"))
  }

  test("the adversarial cases actually exercise the divergence surface") {
    import spark.implicits._
    val probe = Seq("reach 555-66@x.yy today", "weird a@b.cc555-1 tail")
      .toDF("raw")
      .select(PiiScrub.piiScrub($"raw").as("p"))
      .select($"p.n_emails", $"p.n_phones", $"p.clean_text")
      .collect()
    // embedded phone: raw count 1/1, clean shows only <EMAIL>
    assert(probe(0).getInt(0) == 1 && probe(0).getInt(1) == 1)
    assert(probe(0).getString(2) == "reach <EMAIL> today")
    // created boundary: raw phone count 0, but the chain still redacts
    assert(probe(1).getInt(0) == 1 && probe(1).getInt(1) == 0)
    assert(probe(1).getString(2) == "weird <EMAIL><PHONE> tail")
  }
}
