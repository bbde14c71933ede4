package graft

import graft.ext.Text
import org.apache.spark.sql.functions._

/** Text-analysis semantics on known strings (the oracle checks cover the
  * fixtures; these pin the behavior humans can eyeball). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  def docsOf(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("langid picks the language with the most marker hits") {
    val df = docsOf(
      (1L, "the cat and the dog of the house", "en", "s", 32L),
      (2L, "el gato y la casa de los perros", "es", "s", 31L),
      (3L, "der hund und die katze das ist gut", "de", "s", 34L))
    val out = Text.textLangid(df).collect()
    assert(out(0).getAs[String]("pred_lang") == "en")
    assert(out(1).getAs[String]("pred_lang") == "es")
    assert(out(2).getAs[String]("pred_lang") == "de")
  }

  test("quality score rewards length and stopwords, penalizes digits") {
    val longText = ("the quick brown fox jumps over a lazy dog and keeps " +
      "running through the field of tall green grass today").trim // 20 tokens
    val df = docsOf(
      (1L, longText, "en", "s", longText.length.toLong),
      (2L, "1234567890", "en", "s", 10L))
    val out = Text.textQualityScore(df).collect()
    val good = out(0).getAs[Double]("quality_score")
    val bad = out(1).getAs[Double]("quality_score")
    assert(good > 2.9 && good <= 3.0)  // long, stopworded, digit-free
    assert(bad < 0.1)                   // short, all digits
    assert(out(1).getAs[Double]("digit_ratio") == 1.0)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = docsOf(
      (1L, "Hello   World", "en", "s", 13L),
      (2L, "  hello world ", "en", "s", 14L),
      (3L, "hello worlds", "en", "s", 12L))
    val fps = Text.textFingerprint(df).collect().map(_.getAs[String]("fingerprint"))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("token counts: whitespace vs subword chunking") {
    val df = docsOf((1L, "alpha beta12 gamma", "en", "s", 18L))
    val r = Text.textTokenCount(df).collect().head
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // subword [a-z0-9]{1,4} greedy: alph|a|beta|12|gamm|a -> 6
    assert(r.getAs[Long]("subword_tokens") == 6L)
  }

  test("PII scrub redacts crafted emails/phones/IPs in document text") {
    import org.apache.spark.sql.functions._
    // craft text that ITSELF carries PII (beyond the query's synthesized
    // tail): every pattern must be counted and replaced
    val df = docsOf(
      (1L, "reach me at bob.smith+spam@corp.example.org or 415-555-0199 host 192.168.1.254 done", "en", "s", 80L))
    val scrubbed = df.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        Text.EmailRe, "<EMAIL>"), Text.PhoneRe, "<PHONE>"), Text.Ipv4Re, "<IP>").as("t"))
      .collect().head.getAs[String]("t")
    assert(scrubbed == "reach me at <EMAIL> or <PHONE> host <IP> done", scrubbed)
    val counted = Text.textPiiScrub(df).collect().head
    // 1 crafted + 1 synthesized of each kind
    assert(counted.getAs[Long]("n_emails") == 2L)
    assert(counted.getAs[Long]("n_phones") == 2L)
    assert(counted.getAs[Long]("n_ips") == 2L)
  }

  test("chunk windows tile documents with stride overlap and clamp the tail") {
    // 70 tokens, chunkSize 64, stride 32 -> starts at 0, 32, 64
    val text = (1 to 70).map(i => s"w$i").mkString(" ")
    val out = Text.textChunkWindows(docsOf((1L, text, "en", "s", text.length.toLong)))
      .collect()
    assert(out.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_tok"),
      r.getAs[Long]("chunk_tokens"))).toSeq ==
      Seq((0L, 0L, 64L), (1L, 32L, 38L), (2L, 64L, 6L)))
    // empty document produces no chunks
    assert(Text.textChunkWindows(docsOf((2L, "!!!", "en", "s", 3L))).count() == 0)
  }

  test("tokenize stats counts term and document frequencies") {
    val df = docsOf(
      (1L, "spark spark flink", "en", "s", 17L),
      (2L, "spark beam", "en", "s", 10L))
    val out = Text.textTokenizeStats(df).collect()
    val spark_ = out.find(_.getAs[String]("token") == "spark").get
    assert(spark_.getAs[Long]("n") == 3L)
    assert(spark_.getAs[Long]("n_docs") == 2L)
  }
}
