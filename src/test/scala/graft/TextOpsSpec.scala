package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Multimodal

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("t").select(c(col("t"))).head()

  test("tokens drop empties, lowercase") {
    val r = one("  Hello   WORLD  ", c => TextOps.tokens(c))
    assert(r.getSeq[String](0) == Seq("hello", "world"))
  }

  test("langId picks marker-dominant language, und when none") {
    assert(one("the cat and the dog is here", TextOps.langId(_)).getString(0) == "en")
    assert(one("le chat et la maison est dans", TextOps.langId(_)).getString(0) == "fr")
    assert(one("der hund und die katze ist", TextOps.langId(_)).getString(0) == "de")
    assert(one("xyzzy plugh", TextOps.langId(_)).getString(0) == "und")
  }

  test("quality-gate metrics: mean word length, top-ngram fraction, stopwords") {
    def toks(c: org.apache.spark.sql.Column) = TextOps.tokens(c)
    // "aa b cccc" → lens 2,1,4 → mean 7/3
    assert(one("aa b cccc", c => TextOps.meanWordLen(toks(c))).getDouble(0)
      === 7.0 / 3.0)
    assert(one("", c => TextOps.meanWordLen(toks(c))).getDouble(0) === 0.0)
    // "a b a b a" → 2-grams: ab ba ab ba → top frac 2/4
    assert(one("a b a b a", c => TextOps.topNgramFrac(toks(c), 2)).getDouble(0) === 0.5)
    // all distinct 2-grams → 1/n each
    assert(one("a b c d", c => TextOps.topNgramFrac(toks(c), 2)).getDouble(0) === 1.0 / 3.0)
    // fewer tokens than n → no grams → 0.0
    assert(one("solo", c => TextOps.topNgramFrac(toks(c), 2)).getDouble(0) === 0.0)
    assert(one("the cat and the dog", c => TextOps.stopwordHits(lower(c))).getInt(0) == 3)
  }

  test("fingerprint is word-order and duplication insensitive") {
    val a = one("b a c", TextOps.fingerprint(_)).getString(0)
    val b = one("c  b  a a", TextOps.fingerprint(_)).getString(0)
    val c = one("c b d", TextOps.fingerprint(_)).getString(0)
    assert(a == b && a != c)
  }

  test("qualityScore in [0,1] for arbitrary strings (scalacheck gen)") {
    val gen = org.scalacheck.Gen.listOfN(40,
      org.scalacheck.Gen.frequency(
        8 -> org.scalacheck.Gen.alphaNumChar,
        2 -> org.scalacheck.Gen.oneOf(' ', '.', ',', '!', '\t', 'é', '漢')))
      .map(_.mkString)
    val samples = org.scalacheck.Gen.listOfN(50, gen)
      .apply(org.scalacheck.Gen.Parameters.default,
             org.scalacheck.rng.Seed(42L)).get.filter(_.trim.nonEmpty)
    val qs = samples.toDF("t").select(TextOps.qualityScore(col("t")))
      .collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0), qs.mkString(","))
  }

  test("charShingles covers the string with n-grams") {
    val r = one("abcd", TextOps.charShingles(_, 3)).getSeq[String](0)
    assert(r.toSet == Set("abc", "bcd"))
  }

  test("wordShingles: short documents yield the EMPTY set, not a degenerate shingle") {
    // two unrelated one-token docs must NOT pair at jaccard 1.0
    assert(one("hello", TextOps.wordShingles(_, 2)).getSeq[String](0).isEmpty)
    assert(one("", TextOps.wordShingles(_, 2)).getSeq[String](0).isEmpty)
    assert(one("a b c", TextOps.wordShingles(_, 2)).getSeq[String](0).size == 2)
  }

  test("token-derived *Of variants agree with the text-based entry points") {
    val texts = Seq("The quick brown fox", "a A a", "", "  x  ").toDF("t")
      .withColumn("lt", lower(col("t")))
      .withColumn("toks", TextOps.tokensOfLower(col("lt")))
      .withColumn("dtoks", array_distinct(col("toks")))
    val rows = texts.select(
      TextOps.qualityScore(col("t")) === TextOps.qualityScoreOf(col("t"), col("toks"), col("dtoks")),
      TextOps.fingerprint(col("t")) === TextOps.fingerprintOf(col("dtoks")),
      TextOps.langId(col("t")) === TextOps.langIdOfLower(col("lt")),
      TextOps.subwordCount(col("t")) === TextOps.subwordCountOfLower(col("lt")))
      .collect()
    assert(rows.forall(r => (0 until 4).forall(r.getBoolean)), rows.mkString("; "))
  }

  test("subwordCount counts words, digits, punct marks") {
    // "it's 42!" → [it, ', s, 4, 2, !] = 6
    assert(one("it's 42!", TextOps.subwordCount(_)).getInt(0) == 6)
  }

  test("redactPii masks emails, urls, phone-ish runs; plain text untouched") {
    val r = one("mail bob.smith+x@corp.example.com or visit https://ex.com/a?b=1 or call +1 (415) 555-0199 now",
      TextOps.redactPii(_)).getString(0)
    assert(r == "mail <EMAIL> or visit <URL> or call +<PHONE> now", r)
    assert(one("no pii here, just 42 and v1.2", TextOps.redactPii(_)).getString(0)
      == "no pii here, just 42 and v1.2")
  }

  test("repeatedLineRatio flags duplicated non-blank lines") {
    assert(one("a\nb\na\n\n a \nc", TextOps.repeatedLineRatio(_)).getDouble(0) == 0.2) // a dup among 5
    assert(one("x\ny\nz", TextOps.repeatedLineRatio(_)).getDouble(0) == 0.0)
    assert(one("", TextOps.repeatedLineRatio(_)).getDouble(0) == 0.0)
  }

  test("dropRepeatedLines keeps each line's first occurrence, order preserved") {
    assert(one("a\nb\na\nc\nb", TextOps.dropRepeatedLines(_)).getString(0) == "a\nb\nc")
    // blank lines dedup like any other line; whitespace variants are distinct
    assert(one("x\n\ny\n\nx ", TextOps.dropRepeatedLines(_)).getString(0) == "x\n\ny\nx ")
    assert(one("solo", TextOps.dropRepeatedLines(_)).getString(0) == "solo")
    assert(one("", TextOps.dropRepeatedLines(_)).getString(0) == "")
  }

  test("multimodal: feature extraction preserves ids, stub features normalized") {
    val media = Multimodal.asMedia(
      Seq((7L, "hello world")).toDF("id", "txt")
        .withColumn("bin", encode(col("txt"), "UTF-8")),
      "id", "bin", "text").as[Multimodal.MediaRecord]
    val f = Multimodal.extractFeatures(media).head()
    assert(f.media_id == 7L)
    assert(f.byte_len == 11)
    assert(math.abs(f.features.sum - 1.0f) < 1e-5)
  }

  test("CSV parser honors non-UTF8 encodings (reference feeds are windows-1251)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cp1251")
    val file = dir.resolve("data.csv")
    val content = "id;name\n1;Москва\n2;Тверь\n"
    java.nio.file.Files.write(file, content.getBytes("windows-1251"))
    val df = graft.sources.Readers.csv(spark, file.toString,
      delimiter = ";", headers = true, encoding = "windows-1251")
    val names = df.select("name").as[String].collect().sorted.toSeq
    assert(names == Seq("Москва", "Тверь"), names)
  }

  test("quarter dates honor the reference's composite half-year codes") {
    import graft.functions.DateOps
    val rows = Seq((2023, 1), (2023, 2), (2023, 3), (2023, 4), (2023, 34), (2023, 12), (2023, 0))
      .toDF("y", "q")
      .select(col("q"),
        DateOps.quarterStartDate(col("y"), col("q")).cast("string").as("s"),
        DateOps.quarterEndDate(col("y"), col("q")).cast("string").as("e"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1) == (("2023-01-01", "2023-03-31")))
    assert(rows(2) == (("2023-04-01", "2023-06-30")))
    assert(rows(3) == (("2023-07-01", "2023-09-30")))
    assert(rows(4) == (("2023-10-01", "2023-12-31")))
    assert(rows(34) == (("2023-07-01", "2023-12-31"))) // H2: starts Q3, ends Q4
    assert(rows(12) == (("2023-01-01", "2023-06-30"))) // H1: starts Q1, ends Q2
    assert(rows(0) == (("2023-01-01", "2023-12-31")))  // unknown code → whole year
  }

  test("multimodal: resize is size-exact, deterministic, identity at same size") {
    import org.apache.spark.sql.Encoders
    implicit val enc: org.apache.spark.sql.Encoder[Multimodal.MediaRecord] =
      Encoders.product[Multimodal.MediaRecord]
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val media = Seq(Multimodal.MediaRecord(1L, "image", payload, 10, 10, 0)).toDS()
    val down = Multimodal.resize(media, 25).head().payload
    assert(down.length == 25)
    assert(down.toSeq == Multimodal.resize(media, 25).head().payload.toSeq) // deterministic
    assert(Multimodal.resize(media, 100).head().payload.toSeq == payload.toSeq) // identity
    assert(Multimodal.resize(media, 200).head().payload.length == 200) // upsample
  }

  test("multimodal: frame sampling produces stride-spaced frames") {
    val df = Seq((1L, Array.fill[Byte](100)(7))).toDF("id", "bin")
    val frames = Multimodal.sampleFrames(df, "id", "bin", frameBytes = 10, stride = 2)
    val idxs = frames.select("frame_idx").as[Int].collect().sorted
    assert(idxs.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.select(length(col("frame"))).as[Int].collect().forall(_ == 10))
  }

  test("clampChars caps doc length, identity below the cap") {
    assert(one("hello world", TextOps.clampChars(_, 5)).getString(0) == "hello")
    assert(one("hi", TextOps.clampChars(_, 5)).getString(0) == "hi")
    // one knob bounds every downstream dimension: lines, tokens, shingles
    val many = (1 to 100).map(i => s"line $i").mkString("\n")
    val clamped = one(many, t => TextOps.dropRepeatedLines(TextOps.clampChars(t, 20))).getString(0)
    assert(clamped.count(_ == '\n') <= 3)
  }
}
