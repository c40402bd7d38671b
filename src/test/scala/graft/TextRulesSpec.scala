package graft

import org.apache.spark.sql.functions.col
import graft.functions.Text

/** Gopher quality rules ([[graft.functions.Text.gopherRules]]) — rule
  * semantics the sf corpus can't isolate (it passes most rules): each
  * rule's kill condition, and stopword DISTINCTNESS. Oracle parity at sf
  * is `gopher_rules` in CORRECTNESS. */
class TextRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String]) =
    Text.gopherRules(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        minTokens = 3, maxTokens = 6, minMeanLen = 2.0, maxMeanLen = 5.0,
        minAlphaFrac = 0.5, minStopHits = 2)
      .select("doc_id", "ok_len", "ok_mean_len", "ok_alpha", "ok_stop", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("each rule kills independently and pass is their conjunction") {
    val got = run(Seq(
      "the of cat sat",          // 0: all rules pass
      "the of",                  // 1: too short
      "the of a is to and in",   // 2: too long (7 > 6)
      "the of x y",              // 3: mean len 1.75 < 2.0
      "the of 123 456",          // 4: alpha frac 0.5 — passes the floor
      "the cat cat dog",         // 5: only 1 distinct stopword
      "the of 12 34 56"          // 6: alpha 0.4 < 0.5
    ))
    assert(got(0L) == ((true, true, true, true, true)))
    assert(got(1L)._1 == false && got(1L)._5 == false)
    assert(got(2L)._1 == false)
    assert(got(3L)._2 == false)
    assert(got(4L) == ((true, true, true, true, true)))
    assert(got(5L)._4 == false && got(5L)._5 == false)
    assert(got(6L)._3 == false)
  }

  test("repeated stopwords count once (distinct closed-class evidence)") {
    // "the the the the" has 4 stopword TOKENS but 1 distinct stopword
    val got = run(Seq("the the the the"))
    assert(got(0L)._4 == false)
  }

  test("tokensToIds ranks by frequency, breaks ties by token, OOV is -1") {
    import org.apache.spark.sql.functions.col
    // freq: b=3, a=2, c=1, z=1 → ids b=0, a=1; with vocabSize=2, c/z → -1
    val df = Seq((1L, "a b c b"), (2L, "b a z")).toDF("doc_id", "text")
    val got = Text.tokensToIds(df, vocabSize = 2)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 1), (1L, 2, 0), (1L, 3, -1), (1L, 4, 0),
      (2L, 1, 0), (2L, 2, 1), (2L, 3, -1)))
    // array layout agrees with the long layout, independent of partitions
    val arrs = Text.tokenIdArrays(df.repartition(5), vocabSize = 2)
      .orderBy(col("doc_id"))
      .as[(Long, Seq[Int])].collect().toSeq
    assert(arrs == Seq((1L, Seq(1, 0, -1, 0)), (2L, Seq(0, 1, -1))))
  }

  test("urlFilter extracts urls, distinct sorted domains, blocklist flag") {
    val df = Seq(
      (1L, "see https://a.example.com/x and http://b.example.org/y end"),
      (2L, "twice https://a.example.com/1 https://a.example.com/2"),
      (3L, "no urls here"))
      .toDF("doc_id", "text")
    val out = Text.urlFilter(df, Seq("b.example.org"))
      .select("doc_id", "n_urls", "domains", "blocked")
      .as[(Long, Long, Seq[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 2L, Seq("a.example.com", "b.example.org"), true),
      (2L, 2L, Seq("a.example.com"), false),
      (3L, 0L, Seq(), false)))
  }

  test("ngramNovelty: unique-bigram fraction, distinct per doc, short docs absent") {
    val df = Seq(
      (1L, "a b c"),     // {a b, b c}: "a b" shared with doc 2 → 1/2
      (2L, "a b d"),     // {a b, b d} → 1/2
      (3L, "p q r s"),   // all 3 bigrams unique → 1.0
      (4L, "a b a b"),   // distinct {a b, b a}; "b a" unique → 1/2
      (5L, "solo"))      // < 2 tokens → absent
      .toDF("doc_id", "text")
    val got = Text.ngramNovelty(df)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 3L, 3L, 1.0), (4L, 2L, 1L, 0.5)))
  }

  test("urlFilter: empty blocklist never blocks; url spans stop at spaces") {
    val df = Seq((1L, "x https://h.example.com/p?q=1 y")).toDF("doc_id", "text")
    val out = Text.urlFilter(df, Seq.empty)
      .select("urls", "blocked")
      .as[(Seq[String], Boolean)].collect().head
    // '?' is outside the url character class — the span stops before it
    assert(out._1 === Seq("https://h.example.com/p") && !out._2)
  }

  test("sentenceStats: split on '. ', token lengths, trailing-period empty") {
    val docs = Seq(
      (1L, "one two. three four five. six"),   // 3 sentences: 2, 3, 1 tokens
      (2L, "no breaks here"),                  // 1 sentence, 3 tokens
      (3L, "ends with dot. ")                  // 2: "ends with dot" + "" (0)
    ).toDF("doc_id", "text")
    val got = Text.sentenceStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSeq
    assert(got(0) == ((1L, 3L, 6L, 2.0, 1L, 3L)))
    assert(got(1) == ((2L, 1L, 3L, 3.0, 3L, 3L)))
    assert(got(2) == ((3L, 2L, 3L, 1.5, 0L, 3L)))
  }

  test("oovRate: rate against top-K head, count-desc/token-asc tie-break") {
    // counts: a=3, b=2, c=2, z=1 → top-2 head = {a, b} (b beats c on the
    // token tie-break)
    val docs = Seq(
      (1L, "a a b c"), (2L, "a b c z")
    ).toDF("doc_id", "text")
    val got = Text.oovRate(docs, vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 4L, 1L, 0.25), (2L, 4L, 2L, 0.5)))
  }

  test("oovRate: vocab >= distinct tokens means zero OOV everywhere") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = Text.oovRate(docs, vocabSize = 100)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.forall(r => r._3 == 0L && r._4 == 0.0))
  }

  test("stripHtml: blocks die with content, tags keep boundaries, " +
      "entities decode once") {
    def strip(s: String): String = Seq(("x", s)).toDF("k", "h")
      .select(Text.stripHtml(col("h"))).as[String].head()
    // script/style content is DROPPED (code is not prose), even with
    // tag-confusing operators and quotes inside, across lines
    assert(strip("<p>keep</p><script>\nif (a < b) { s = \"</div>\"; }\n" +
      "</script><style>p { color: red }\n.c{x:1}</style><p>tail</p>")
      == "keep tail")
    // tags become word boundaries, never concatenation
    assert(strip("<p>a</p><p>b</p>") == "a b")
    assert(strip("line<br/>break") == "line break")
    // entity single-decode: &amp;lt; is the LITERAL four chars "&lt;"
    assert(strip("&quot;q&quot; &amp; &#39;s&#39; a&nbsp;b &lt;tag&gt; &amp;lt;")
      == "\"q\" & 's' a b <tag> &lt;")
    // whitespace (incl. newlines/tabs) collapses; ends trim
    assert(strip("  a\n\n\tb  ") == "a b")
    assert(strip("<html><body></body></html>") == "")
    // attributes with slashes/uppercase, case-insensitive block tags
    assert(strip("<SCRIPT src=\"/x.js\">dead()</SCRIPT>alive") == "alive")
    // plain prose passes through untouched
    assert(strip("no markup here") == "no markup here")
  }
}
