package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** NFC normalization expression: composition cases, the ASCII fast path
  * (identity, no allocation), already-NFC non-ASCII identity, idempotence,
  * the dedup tie-in (variants hash together after normalization), and
  * codegen evaluation.
  */
class NfcNormalizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("nfcnorm-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def nfc(s: String): String =
    TextNormStatics.nfc(UTF8String.fromString(s)).toString

  test("combining sequences compose; singletons map; ligatures survive") {
    assert(nfc("café") == "café")
    assert(nfc("Å") == "Å")
    assert(nfc("Å") == "Å", "ANGSTROM SIGN is a singleton")
    assert(nfc("Ω") == "Ω", "OHM SIGN composes to GREEK OMEGA")
    assert(nfc("ﬁ") == "ﬁ", "NFC preserves the fi ligature")
    assert(nfc("가") == "가", "precomposed Hangul unchanged")
    assert(nfc("가") == "가", "Hangul jamo compose")
  }

  test("ASCII fast path returns the SAME object, untouched") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(TextNormStatics.nfc(in) eq in)
  }

  test("already-NFC non-ASCII returns the same object too") {
    val in = UTF8String.fromString("café déjà")
    assert(TextNormStatics.nfc(in) eq in)
  }

  test("idempotent") {
    val tricky = "x̨́y Å 각"
    assert(nfc(nfc(tricky)) == nfc(tricky))
  }

  test("dedup tie-in: composed and decomposed variants hash together") {
    import spark.implicits._
    val df = Seq((1L, "café menu"), (2L, "café menu"))
      .toDF("id", "text")
    val rawDistinct = df.select(sha2(col("text"), 256)).distinct().count()
    val normDistinct = df
      .select(sha2(TextHash.nfcNormalize(col("text")), 256))
      .distinct().count()
    assert(rawDistinct == 2L && normDistinct == 1L)
  }

  test("evaluates inside codegen over a DataFrame") {
    import spark.implicits._
    val out = Seq("áb", "plain").toDF("t")
      .select(TextHash.nfcNormalize(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(out == Seq("áb", "plain"))
  }
}
