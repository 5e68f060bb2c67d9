package graft

import graft.operators.TextOps

/** PII redaction (generic face over planted fixtures — the corpus query
  * plants its own PII, see TextOps.piiRedactQuery) and the bigram-LM
  * fluency score's laws. */
class PiiRedactSpec extends SparkSpec {

  import spark.implicits._

  test("piiRedact: every pattern fires, counts match, placeholders land, " +
    "clean text passes through byte-identical") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org today"),
      (2L, "call +44 (0) 207-946 0958 now or ping 192.168.0.17"),
      (3L, "order 123456789012 shipped"),
      (4L, "no pii here at all"),
      (5L, "two mails: a@b.io and c.d@e.co plus 10.0.0.1")).toDF("doc_id", "text")
    val r = TextOps.piiRedact(docs).orderBy("doc_id")
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_id9", "n_pii", "redacted")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getString(6)))

    assert(r(0) == ((1L, 1L, 0L, 0L, 0L, 1L, "mail me at <EMAIL> today")), s"${r(0)}")
    assert(r(1) == ((2L, 0L, 1L, 1L, 0L, 2L, "call <PHONE> now or ping <IP>")), s"${r(1)}")
    assert(r(2) == ((3L, 0L, 0L, 0L, 1L, 1L, "order <ID> shipped")), s"${r(2)}")
    assert(r(3) == ((4L, 0L, 0L, 0L, 0L, 0L, "no pii here at all")), s"${r(3)}")
    assert(r(4) == ((5L, 2L, 0L, 1L, 0L, 3L,
      "two mails: <EMAIL> and <EMAIL> plus <IP>")), s"${r(4)}")
  }

  test("pattern ORDER prevents double counting: a dotted quad inside an " +
    "email-like string is redacted once, as the email") {
    val docs = Seq((1L, "odd but valid 10.0.0.1@hosts.example.com here"))
      .toDF("doc_id", "text")
    val r = TextOps.piiRedact(docs).head()
    assert(r.getAs[Long]("n_email") == 1 && r.getAs[Long]("n_ip") == 0,
      s"quad double-counted: $r")
    assert(r.getAs[String]("redacted") == "odd but valid <EMAIL> here")
  }

  test("corpus query plants PII on every row and redacts it all") {
    val out = TextOps.piiRedactQuery(spark, sf())
    val nDocs = Tables.documentsPar(spark, sf()).count()
    assert(out.count() == nDocs, s"one row per document expected")
    assert(out.filter($"n_email" < 1 || $"n_phone" < 1 || $"n_ip" < 1 ||
      $"n_id9" < 1).isEmpty, "a planted PII item survived")
    assert(out.filter($"redacted".rlike("@|\\+1 \\(")).isEmpty,
      "raw PII text left in redacted output")
  }

  test("bigram LM: formulaic text outscores gibberish; a hand-computed " +
    "2-doc corpus is exact on the integer grid") {
    // corpus of two docs sharing the prefix vocabulary:
    //   doc 1 = "a b a b a b"  -> bigrams: ab,ba,ab,ba,ab
    //   doc 2 = "a b c"        -> bigrams: ab,bc
    // counts: c(ab)=4? no — ab appears 3 (doc1) + 1 (doc2) = 4, ba=2, bc=1
    // prefixes: c(a.)=4, c(b.)=3
    // doc1 grid = 3*floor(4G/4) + 2*floor(2G/3) = 3G + 2*floor(2G/3)
    // doc2 grid = floor(4G/4) + floor(1G/3)     = G + floor(G/3)
    val G = 1048576L
    val docs = Seq((1L, "a b a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val byId = TextOps.bigramLmFrame(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("lm_grid"))).toMap
    assert(byId(1L) == ((5L, 3 * G + 2 * (2 * G / 3))), s"doc1: ${byId(1L)}")
    assert(byId(2L) == ((2L, G + G / 3)), s"doc2: ${byId(2L)}")

    // law on the corpus: a doc of pure repeated text scores >= the
    // corpus median (its transitions dominate the counts)
    val out = TextOps.bigramLm(spark, sf())
    assert(out.count() == Tables.documentsPar(spark, sf()).count())
    val scores = out.select("lm_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0),
      "lm_score out of [0,1] — grid ratio broken")
  }
}
