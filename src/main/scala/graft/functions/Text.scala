package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (EXT tier, SURVEY §2.5 /
  * §7.2 item 5). The reference has no scalar function library at all
  * (`/root/reference/source/koalas/dataframe.d:238-262` delegates to user
  * lambdas); these are the operations a 100 TB training-data pipeline needs,
  * built from codegen'd Catalyst expressions and higher-order functions —
  * no UDFs, so every one of them stays inside whole-stage codegen and
  * scales embarrassingly (per-row, no shuffle).
  */
object Text {

  /** Whitespace tokenization. Single-space split matches the corpus
    * convention of the `documents` table (space-joined word soup). */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-document statistics: char count, token count, distinct-token
    * count, summed token length, average token length.
    *
    * The token array and the token-length sum are each bound to an
    * attribute once and reused: interpreted HOFs are not CSE'd, so
    * referencing `aggregate(t, …)` twice (sum + avg) would traverse every
    * token list twice. CollapseProject keeps the binding projections intact
    * because the bound attributes feed multiple non-cheap expressions. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), length(col("text")).as("n_chars2"),
        tokens(col("text")).as("_t"))
      .select(col("doc_id"), col("n_chars2"),
        size(col("_t")).as("n_tokens"),
        size(array_distinct(col("_t"))).as("n_uniq_tokens"),
        aggregate(col("_t"), lit(0), (acc, x) => acc + length(x))
          .cast(LongType).as("sum_token_len"))
      .select(col("doc_id"), col("n_chars2"), col("n_tokens"),
        col("n_uniq_tokens"), col("sum_token_len"),
        (col("sum_token_len").cast(DoubleType) / col("n_tokens"))
          .as("avg_token_len"))

  /** BPE-ish regex token count alongside whitespace count: runs of
    * lowercase letters, digit runs, and single other non-space chars. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      regexp_count(col("text"), lit(bpeishPattern)).as("n_bpeish_tokens")
    )

  /** Context-window chunking: split each document's token stream into
    * windows of `sizeTokens` tokens advancing by `strideTokens` (overlap =
    * size − stride) — the example-construction step between corpus
    * cleaning and [[Packing.packSequences]] in a training pipeline. Every
    * token is covered; the LAST window of a document may be shorter
    * (`slice` clamps at the end of the array). Documents with ≤`sizeTokens`
    * tokens yield exactly one chunk.
    *
    * Chunk count is pure integer arithmetic
    * (`ceil((n − size) / stride) + 1` via `div`), so the layout is
    * engine-exact and the DuckDB oracle reproduces it bit-for-bit. Scale
    * shape: per-row explode with fan-out ~n/stride — no shuffle, no driver
    * state; output size is input·(size/stride), the expected overlap
    * factor. */
  def chunkDocs(docs: DataFrame, sizeTokens: Int, strideTokens: Int): DataFrame = {
    require(sizeTokens > 0, s"sizeTokens must be positive, got $sizeTokens")
    require(strideTokens > 0 && strideTokens <= sizeTokens,
      s"strideTokens must be in [1, sizeTokens=$sizeTokens], got $strideTokens")
    val nChunks = when(col("_n") <= sizeTokens, lit(1L))
      .otherwise(expr(s"(_n - $sizeTokens + $strideTokens - 1) div $strideTokens") + lit(1L))
    val start = (col("chunk_id") * strideTokens + 1).cast(IntegerType)
    val chunk = slice(col("_toks"), start, lit(sizeTokens))
    docs
      .select(col("doc_id"), tokens(col("text")).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_id", col("chunk_id").cast(IntegerType))
      .select(
        col("doc_id"),
        col("chunk_id"),
        array_join(chunk, " ").as("chunk_text"),
        size(chunk).as("n_chunk_tokens"))
  }

  /** Language-ID marker words. Deterministic n-gram-free heuristic: count
    * exact-token hits per language's closed-class markers, argmax with a
    * fixed tie order. (A real pipeline would plug a fastText-style model in
    * at the same operator position — the plan shape is identical.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "und", "die", "ist", "das"),
    "es" -> Seq("el", "la", "que", "los", "es"),
    "fr" -> Seq("le", "et", "les", "des", "est")
  )

  /** Adds `lang_pred`: argmax over marker-hit counts, 'und' if no hits.
    * Tie-break: earlier language in [[langMarkers]] wins.
    *
    * Single-tokenize shape: `split(text)` is bound to ONE attribute and the
    * four marker counts project from it; the counts are THEMSELVES bound to
    * attributes before the argmax fold, because the fold references each
    * count ~3× per level — inlined, that nests the interpreted `filter`
    * traversals exponentially (the measured 4×-retokenize that made this
    * the slowest query in round 5). Both binding projections survive
    * CollapseProject (multi-use, non-cheap). */
  def langId(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("_toks"))
    val withHits = toks.select(
      col("doc_id") +: col("lang") +:
        langMarkers.map { case (l, ms) =>
          size(filter(col("_toks"), t => t.isin(ms.map(lit): _*)))
            .as(s"_mk_$l")
        }: _*)
    val hits = langMarkers.map { case (l, _) => l -> col(s"_mk_$l") }
    val best = hits.foldRight(lit("und") -> lit(0)) {
      case ((l, h), (bl, bh)) => // fold right so earlier langs win ties via >=
        (when(h >= bh && h > 0, lit(l)).otherwise(bl),
          when(h >= bh, h).otherwise(bh))
    }._1
    withHits.select(col("doc_id"), col("lang"), best.as("lang_pred"))
  }

  /** Stopword set for quality scoring. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in")

  /** Heuristic quality score in [0,1]: blend of stopword ratio, alpha
    * ratio, and clamped length — the standard cheap pre-filter shape for
    * web-scale corpus cleaning. All per-row IEEE arithmetic:
    * deterministic across engines and cluster sizes. */
  def qualityScore(docs: DataFrame): DataFrame = {
    // bind the token array once (same single-tokenize shape as langId)
    val toks = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("_t"))
    val nTok = size(col("_t")).cast(DoubleType)
    val stopRatio =
      size(filter(col("_t"), x => x.isin(stopwords.map(lit): _*))) / nTok
    // zero-length guard: x/0 is a fatal DIVIDE_BY_ZERO under default ANSI
    // mode — an empty doc scores 0 alpha evidence, it must not kill the
    // cleaning stage (the compressionRatio convention)
    val alphaRatio = when(length(col("text")) > 0,
      length(regexp_replace(col("text"), "[^a-z]", "")).cast(DoubleType) /
        length(col("text"))).otherwise(lit(0.0))
    val lenScore = least(nTok / 200.0, lit(1.0))
    toks
      .select(
        col("doc_id"),
        stopRatio.as("stop_ratio"),
        alphaRatio.as("alpha_ratio"),
        lenScore.as("len_score"))
      .select(col("doc_id"), col("stop_ratio"), col("alpha_ratio"),
        col("len_score"),
        (col("stop_ratio") * 0.5 + col("alpha_ratio") * 0.3 +
          col("len_score") * 0.2).as("quality"))
  }

  /** Compression-ratio quality signal: per-doc
    * `deflate_len(text) / octet_length(text)` via the codegen'd
    * [[graft.plans.DeflateLen]] kernel — the corpus-filter heuristic
    * complementing the Gopher rules (RefinedWeb / Dolma style): a ratio
    * near 0 is boilerplate/repetition spam, a ratio near (or above) 1 is
    * high-entropy noise; natural prose sits in a stable mid band. Zero
    * shuffle, O(bytes) per row inside whole-stage codegen; `ratio` is a
    * single IEEE divide of two exact ints. Empty text → null ratio (no
    * evidence either way — don't let a 0-byte doc masquerade as spam). */
  def compressionRatio(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.plans.DeflateLen.deflateLen(col("text")).as("deflate_len"),
      octet_length(col("text")).cast("long").as("raw_len"))
      // second projection so the deflate kernel is bound ONCE (the alias
      // is multiply-referenced and non-cheap, so CollapseProject keeps it)
      .select(col("doc_id"), col("deflate_len"), col("raw_len"),
        when(col("raw_len") > 0,
          col("deflate_len").cast(DoubleType) /
            col("raw_len").cast(DoubleType)).as("compress_ratio"))

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) — the
    * published multi-criteria document filter, as per-rule booleans plus
    * the conjunction: token count within bounds, mean token length within
    * bounds, fraction of alphabetic tokens above a floor, and a minimum
    * number of DISTINCT stopwords present (the "closed-class evidence"
    * rule). Per-rule flags (not just the verdict) are what pipeline owners
    * monitor: each rule's kill rate is a corpus-drift alarm.
    *
    * Scale shape: one projection over a single bound token array — zero
    * shuffle, codegen-friendly comparisons; the stopword probe iterates
    * the CONSTANT stopword list against the doc array, not the doc
    * against the list, so cost is O(|stopwords|·lookup), independent of
    * doc length ordering. All ratios are single IEEE divides of exact
    * integer counts — bit-reproducible across engines. */
  def gopherRules(
      docs: DataFrame,
      minTokens: Int = 15,
      maxTokens: Int = 150,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2
  ): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val meanLen = aggregate(col("_t"), lit(0L), (acc, x) => acc + length(x))
      .cast(DoubleType) / col("_n").cast(DoubleType)
    val alphaFrac = size(filter(col("_t"), x => x.rlike("[a-z]")))
      .cast(DoubleType) / col("_n").cast(DoubleType)
    val stopHits = size(filter(
      array(stopwords.map(lit): _*), s => array_contains(col("_t"), s)))
    base.select(
        col("doc_id"), col("_n").as("n_tokens"),
        meanLen.as("mean_token_len"), alphaFrac.as("alpha_frac"),
        stopHits.as("n_stop_hits"))
      .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
        col("alpha_frac"), col("n_stop_hits"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .as("ok_len"),
        (col("mean_token_len") >= minMeanLen &&
          col("mean_token_len") <= maxMeanLen).as("ok_mean_len"),
        (col("alpha_frac") >= minAlphaFrac).as("ok_alpha"),
        (col("n_stop_hits") >= minStopHits).as("ok_stop"))
      .withColumn("pass",
        col("ok_len") && col("ok_mean_len") && col("ok_alpha") && col("ok_stop"))
  }

  /** Gopher-style intra-document repetition score: the share of the doc's
    * `w`-gram stream taken by its single most frequent `w`-gram — the
    * cheap detector for looped/boilerplate text (a clean doc scores near
    * 1/n_grams; a repeated-line doc approaches 1.0).
    *
    * Scale shape: ZERO shuffle. The relational form (explode grams →
    * groupBy(doc, gram) → max) shuffles the whole gram stream; here the
    * max multiplicity is computed per-row as the longest run in the
    * row's SORTED gram array via one `aggregate` fold — embarrassingly
    * parallel, and the gram array never leaves the row. */
  def repetitionScore(docs: DataFrame, w: Int = 2): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("_t"))
      .filter(size(col("_t")) >= w)
    // non-distinct w-gram list (multiplicities matter here)
    val grams = transform(sequence(lit(0), size(col("_t")) - w),
      i => concat_ws(" ", (0 until w).map(j => element_at(col("_t"), i + 1 + j)): _*))
    val zero = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
    val maxRun = aggregate(array_sort(grams), zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    toks
      .select(col("doc_id"),
        maxRun.cast(LongType).as("max_gram_count"),
        size(col("_t")).cast(LongType).minus(w - 1).as("n_grams"))
      .select(col("doc_id"), col("max_gram_count"), col("n_grams"),
        (col("max_gram_count").cast(DoubleType) / col("n_grams"))
          .as("top_gram_share"))
  }

  /** PII patterns for [[redactPii]] — kept to the regex subset Java
    * (Spark) and RE2 (DuckDB) interpret identically (char classes +
    * bounded quantifiers, no lookaround/backrefs), so the redacted
    * strings hash-match across engines. */
  val emailPattern = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
  val longNumberPattern = "[0-9]{6,}"

  /** Deterministic PII redaction — the scrub pass of a training-data
    * pipeline: email-like spans then long digit runs become typed
    * placeholders (emails first: they contain digits). Per-row codegen'd
    * `regexp_replace`, zero shuffle; counts emitted so a pipeline can
    * quarantine PII-dense documents rather than silently rewriting them. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col(textCol), lit(emailPattern)).as("n_emails"),
      regexp_count(
        regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
        lit(longNumberPattern)).as("n_numbers"),
      regexp_replace(
        regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
        longNumberPattern, "<NUM>").as("redacted"))

  /** HTML → text extraction — the first pass every web-crawl pipeline
    * runs before any quality/dedup stage: script and style blocks are
    * dropped WITH their content (code is not prose), remaining tags
    * become whitespace (so `<p>a</p><p>b</p>` keeps its word boundary),
    * the six entities that dominate real HTML unescape (`&amp;` LAST —
    * the single-decode convention, so `&amp;lt;` yields the literal
    * `&lt;` rather than double-decoding to `<`), and whitespace
    * collapses to single spaces, trimmed.
    *
    * All codegen'd `regexp_replace`/`replace` — per-row, zero shuffle.
    * Regexes stay in the engine-portable subset ([[emailPattern]]'s
    * rule) plus non-greedy `.*?` and inline `(?is)` flags, which Java
    * regex and RE2 agree on; NO backreferences (RE2 lacks them — script
    * and style close-tags are spelled out separately). Known limitation,
    * shared with every regex-based extractor: a literal `>` inside a
    * quoted attribute value ends the tag early — full DOM parsing is a
    * codec-tier job ([[Multimodal]]'s mapPartitions pattern), not a
    * per-row expression. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** URL span (scheme through the last path char) and its capture-group
    * domain form. Same engine-portable regex subset as [[emailPattern]]:
    * literal classes and quantifiers only, hyphen last inside classes. */
  val urlPattern = "https?://[a-zA-Z0-9./_-]+"
  val urlDomainPattern = "https?://([a-zA-Z0-9.-]+)"

  /** URL / domain extraction + domain blocklist flag — the provenance
    * filter of a crawl pipeline: spam/SEO domains, known-contaminated
    * mirrors, and licensing-excluded hosts are dropped by DOMAIN, not by
    * content. Emits per-document extracted URLs, their distinct ordered
    * domains, and whether any domain hits the blocklist; the pipeline
    * filters on `blocked` (or quarantines instead — both need the flag,
    * not a silent drop).
    *
    * Per-row codegen'd regexp work, zero shuffle; the blocklist is a
    * literal IN-list (configuration-sized, not data-sized).
    */
  def urlFilter(
      docs: DataFrame,
      blockedDomains: Seq[String],
      textCol: String = "text"
  ): DataFrame = {
    val urls = regexp_extract_all(col(textCol), lit(urlPattern), lit(0))
    docs
      .withColumn("urls", urls)
      .withColumn("domains",
        array_sort(array_distinct(transform(col("urls"),
          u => regexp_extract(u, urlDomainPattern, 1)))))
      .withColumn("n_urls", size(col("urls")).cast("long"))
      .withColumn("blocked",
        if (blockedDomains.isEmpty) lit(false)
        else exists(col("domains"), d => d.isin(blockedDomains: _*)))
  }

  /** Canonical URL form for provenance dedup — the crawl-pipeline
    * normalization applied before "same page fetched twice" collapse:
    * fragment dropped, scheme and host lowercased, `www.` and the
    * scheme's default port stripped, `utm_*` tracking params removed
    * (with their dangling `?`/`&`), trailing path slash removed. Path
    * case is PRESERVED (paths are case-sensitive; only authority parts
    * are normalized). Engine-portable regex subset only — every step has
    * a 1:1 DuckDB `regexp_replace(..., 'g')` mirror. Zero shuffle,
    * codegen'd per row. Non-URL input (no `scheme://`) canonicalizes to
    * `"://"`-prefixed garbage rather than null — callers filter upstream. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1))
    val host1 = regexp_replace(
      lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]+)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .otherwise(host1)
    // utm params are matched WITH their leading separator (a bare
    // `utm_...=` pattern would also fire mid-name inside `?xutm_a=1` and
    // — name class includes digits (`utm_campaign2` is in the wild);
    // uppercase variants are deliberately NOT collapsed (tracking params
    // are conventionally lowercase, and a case-insensitive flag would
    // need mirroring into the DuckDB oracle's regexp dialect) —
    // corrupt a non-utm param). `&`-led utm params just vanish; a
    // `?`-led utm param hands its `?` to the successor param (or drops
    // it when it was the last) — rewriting the FIRST `&` after the fact
    // would corrupt a literal `&` in a query-less path (`/a&b`, a legal
    // RFC 3986 sub-delim). The `?`-led patterns can match at most once
    // (one `?` per URL), so Spark's replace-all and DuckDB's
    // replace-first agree on them; only the `&`-led removal needs 'g'.
    // The trailing-slash strip is PATH-scoped: `^([^?]*)/$` can only
    // match when the rest has no query at all, so a slash ending a
    // query-parameter VALUE survives.
    val rest = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]+(.*)$", 1),
              "&utm_[a-zA-Z0-9_]+=[^&#]*", ""),
            "\\?utm_[a-zA-Z0-9_]+=[^&#]*&", "?"),
          "\\?utm_[a-zA-Z0-9_]+=[^&#]*$", ""),
        "[?&]$", ""),
      "^([^?]*)/$", "$1")
    concat(scheme, lit("://"), host, rest)
  }

  /** URL-keyed exact dedup (the CommonCrawl "seen this page" collapse):
    * group on [[canonicalizeUrl]], keep the smallest doc_id per canonical
    * URL, report the collapse count. One hash shuffle on the canonical
    * key with map-side combine; the canonicalization itself is per-row.
    * Same keep-first convention as `Dedup.exact`. */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .select(col("doc_id"), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("canonical_url"), col("n_dups"))

  /** N-gram novelty — per-document fraction of its distinct w-grams that
    * occur in NO other document. The memorization/contamination lens on a
    * corpus: low-novelty documents are recombinations of corpus-common
    * phrasing (templates, boilerplate survivors, paraphrase dups); novel
    * documents carry unique content worth keeping. The complement of the
    * dedup family: dedup finds pairs, novelty scores each doc against the
    * WHOLE corpus in aggregate.
    *
    * Scale shape: one explode pass to per-doc distinct shingles, a
    * shingle-keyed document-frequency aggregate (map-side combine — the
    * shuffle is distinct-shingle-sized), and an equi-join back. Documents
    * with fewer than `w` tokens have no w-grams and are absent.
    *
    * @return (doc_id, n_ngrams, n_unique, novelty) — novelty =
    *         n_unique / n_ngrams, one IEEE divide of exact counts.
    */
  def ngramNovelty(docs: DataFrame, w: Int = 2): DataFrame = {
    val ds = NearDup.docShingles(docs, w)
      .select(col("doc_id"), xxhash64(col("shingle")).as("_h"))
    val dfT = ds.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    ds.join(dfT, "_h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_ngrams"))
  }

  /** Order-canonical document fingerprint: md5 over the sorted distinct
    * token set. Two documents with permuted/duplicated tokens share a
    * fingerprint — the cheap bag-of-words near-dup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(tokens(col("text")))), " "))
        .as("fp"))

  /** Corpus vocabulary: top-k tokens by frequency (tie-break: token asc) —
    * the first pass of any tokenizer/BPE training. Explode → count with
    * map-side combine; shuffle volume is the vocabulary, not the corpus. */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Frequency-ranked vocabulary with stable integer ids: id = rank by
    * (count desc, token) over the whole corpus, 0-based — the id
    * assignment step of tokenizer training. Vocabulary ids are
    * deterministic, so an encode is reproducible forever.
    *
    * NO global ranking window: the top `vocabSize` tokens come out of a
    * distributed TakeOrdered (per-partition top-k, driver merge of
    * `vocabSize` rows — never a full sort, never a single-partition
    * window over the unbounded distinct-token set), and ids are assigned
    * on the driver. A tokenizer vocabulary is configured-constant-sized —
    * the same bounded-metadata class as the centroid/codebook collects. */
  def vocabWithIds(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val spark = docs.sparkSession
    val top = docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(vocabSize)
      .collect()
    val rows = top.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.getString(0), r.getLong(1), i)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("token_id",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  /** Encode documents against a [[vocabWithIds]] vocabulary, long format:
    * one row per token position with its id (OOV → -1). Downstream
    * packing/batching reads this directly; [[tokenIdArrays]] re-collects
    * per-doc arrays when a nested layout is wanted.
    *
    * Scale shape: the token explode is the unavoidable stream (pos rides
    * along, so order never depends on partitioning); the vocab join is a
    * k-row side that AQE broadcasts; no window over the stream. The
    * global ranking window inside [[vocabWithIds]] is over distinct
    * tokens — vocab-sized, the same bounded-metadata class as the
    * centroid/prefix collects. */
  def tokensToIds(docs: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = vocabWithIds(docs, vocabSize).select(col("token"), col("token_id"))
    docs
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "token")))
      .join(vocab, Seq("token"), "left")
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        coalesce(col("token_id"), lit(-1)).as("token_id"))
  }

  /** [[tokensToIds]] re-collected to one `ids` array per doc (position
    * order pinned by the sort, partition-independent). */
  def tokenIdArrays(docs: DataFrame, vocabSize: Int): DataFrame =
    tokensToIds(docs, vocabSize)
      .groupBy(col("doc_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        x => x.getField("token_id")).as("ids"))

  /** Corpus-frequency quality score — the log-free cousin of LM-perplexity
    * filtering: a document built from tokens the corpus rarely uses (OCR
    * noise, mojibake, boilerplate IDs) scores low mean corpus term
    * frequency; natural prose scores high. Per doc: token count, the
    * exact BIGINT sum of each token's corpus frequency, and their ratio
    * (one IEEE divide of exact integers — bit-reproducible, unlike a
    * log-prob sum whose libm and reduction order both vary).
    *
    * Two shuffles at any scale: the corpus frequency aggregate (vocab-
    * sized) and the token→frequency join (AQE broadcasts the vocab side
    * when it fits); the per-doc aggregate rides the join's doc_id
    * partials. */
  def unigramQuality(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val corpusFreq = toks.groupBy(col("token")).agg(count(lit(1)).as("corpus_tf"))
    toks.join(corpusFreq, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("corpus_tf")).as("sum_tf"))
      .withColumn("mean_tf", col("sum_tf").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Top terms per document by tf·(N/df) — the ratio-idf variant (no
    * logarithm on purpose: libm log() may differ in the last ulp across
    * engines, tf·N/df is exact integer arithmetic into one IEEE divide,
    * bit-reproducible everywhere). Two shuffles: per-(doc,term) counts and
    * the per-term doc frequency, joined on the term. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = terms.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df_ = terms.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "token").crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("doc_id"), col("token"), col("score"))
      .orderBy(col("doc_id"), col("token"))
  }

  /** Collocation mining: corpus-wide adjacent-bigram counts scored by the
    * ratio form of pointwise mutual information,
    * `N·c(xy) / (c(x)·c(y))` — the log-free PMI monotone transform
    * (log() may differ in the last ulp across engines; the ratio is exact
    * integer arithmetic into one IEEE divide, bit-reproducible). Bigrams
    * below `minCount` are noise-pruned, top `k` returned.
    *
    * Scale shape: bigrams via a per-row `zip_with` of two slices (no
    * window, no self-join), one vocabulary-sized shuffle each for bigram
    * and unigram counts, equality joins bigram→unigram (AQE picks the
    * strategy — the unigram table is vocabulary-sized, not corpus-sized),
    * and the corpus token total rides a broadcast 1-row cross join.
    * Counts stay < 2^53 so the double conversion is exact up to ~9e15
    * tokens — beyond 100 TB of text. */
  def collocationsPmi(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val dl = docs.select(tokens(col("text")).as("l"))
    val bigrams = dl.select(explode(
      zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
    val bc = bigrams
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uc = dl.select(explode(col("l")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = dl.select(sum(size(col("l")).cast("long")).as("n_tokens"))
    bc
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .select(
        col("w1"), col("w2"), col("c_xy").as("n_pair"),
        ((col("c_xy") * col("n_tokens")).cast("double") /
          (col("c1") * col("c2"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Corpus-adaptive stopword filtering: tokens whose corpus share
    * exceeds `maxShare` are dropped from every document (the df-ratio
    * stopword criterion — no hand-curated list, works for any
    * language). Output: doc_id, the filtered text (token order
    * preserved), and the removed-token count.
    *
    * Scale shape: the stop SET is provably bounded — share > s admits
    * at most ⌊1/s⌋ tokens — so it rides a broadcast 1-row cross join
    * (same contract as the vocab-head collects); the corpus pays one
    * vocabulary-sized count shuffle plus a per-row `filter` lambda,
    * no join on the token stream. */
  def stopwordFilter(docs: DataFrame, maxShare: Double): DataFrame = {
    require(maxShare > 0.0 && maxShare < 1.0,
      s"maxShare must be in (0,1), got $maxShare")
    val dl = docs.select(col("doc_id"), tokens(col("text")).as("l"))
    val tok = dl.select(explode(col("l")).as("w"))
    val tot = tok.agg(count(lit(1)).as("n_tok"))
    val stops = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(tot))
      .filter(col("c").cast("double") / col("n_tok") > maxShare)
      .agg(sort_array(collect_list(col("w"))).as("_stops"))
    val kept = filter(col("l"), t => !array_contains(col("_stops"), t))
    dl.crossJoin(broadcast(stops))
      .select(
        col("doc_id"),
        array_join(kept, " ").as("filtered_text"),
        (size(col("l")) - size(kept)).cast("long").as("n_removed"))
  }

  /** Per-document sentence-shape statistics: sentence count (split on
    * ". " — the same literal-split convention as [[tokens]]), mean
    * sentence length in whitespace tokens, and the longest/shortest
    * sentence token counts. Degenerate sentence structure (one endless
    * run-on, or staccato fragments) is a strong quality signal the
    * Gopher-style rules don't capture. Pure per-row expressions, zero
    * shuffle; the one mean division is a single IEEE op over exact
    * integer counts. */
  def sentenceStats(docs: DataFrame): DataFrame = {
    val sents = split(col("text"), "\\. ")
    val lens = transform(sents, s =>
      when(length(s) === 0, lit(0)).otherwise(size(split(s, " "))))
    // bind the per-sentence length array and its fold ONCE (the
    // textStats/langId convention): inlined, the transform+split would
    // re-evaluate per consuming expression — the measured 4×-retokenize
    // class this file's other operators already avoid
    docs
      .select(col("doc_id"), sents.as("_s"), lens.as("_lens"))
      .select(col("doc_id"), col("_lens"),
        size(col("_s")).cast("long").as("n_sentences"),
        aggregate(col("_lens"), lit(0L), (a, x) => a + x).as("n_sent_tokens"))
      .select(
        col("doc_id"),
        col("n_sentences"),
        col("n_sent_tokens"),
        (col("n_sent_tokens").cast("double") / col("n_sentences"))
          .as("mean_sent_tokens"),
        array_min(col("_lens")).cast("long").as("min_sent_tokens"),
        array_max(col("_lens")).cast("long").as("max_sent_tokens"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` token head — the coverage diagnostic run before
    * committing to a tokenizer vocabulary (a doc whose tokens mostly
    * miss the head is noise, another script, or markup). Output:
    * doc_id, n_tokens, n_oov, and `oov_rate = n_oov / n_tokens`.
    *
    * Scale shape: the vocab head is a distributed TakeOrdered of a
    * configured-constant `vocabSize` rows (the bounded-metadata
    * contract shared with [[vocabWithIds]]), broadcast back as ONE
    * sorted array; the corpus pays the vocabulary count shuffle plus a
    * per-row membership lambda — no join on the token stream. The
    * single division per row is IEEE-deterministic, so the rate
    * hash-matches the SQL oracle. */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val vocab = vocabTopK(docs, vocabSize)
      .agg(sort_array(collect_list(col("token"))).as("_vocab"))
    val dl = docs.select(col("doc_id"), tokens(col("text")).as("_l"))
    val inVocab = filter(col("_l"), t => array_contains(col("_vocab"), t))
    val nOov = size(col("_l")) - size(inVocab)
    // bind the membership scan ONCE: nOov inlined into two output
    // columns would run the O(tokens·vocab) filter twice per row
    dl.crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        size(col("_l")).cast("long").as("n_tokens"),
        nOov.cast("long").as("n_oov"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  // ---- Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) ----
  // Tokenizer-FAITHFUL token counts: packing/quota decisions in a real
  // training pipeline follow the actual tokenizer's counts, not whitespace
  // splits. The kernel lives in [[graft.plans.Bpe]]; here: the distributed
  // merge-learning pass, the Column faces, and the checked-in fixture.

  /** Learn `nMerges` BPE merges from a corpus (the standard algorithm:
    * repeatedly merge the most frequent adjacent symbol pair, weighted by
    * word frequency; ties break lexicographically so training is
    * deterministic).
    *
    * Scale shape: ONE distributed pass builds the word-frequency table
    * (explode → count, shuffle is vocabulary-sized) truncated to the
    * `maxWords` most frequent words — tokenizer training on the vocabulary
    * HEAD is the standard practice, and it bounds driver state the same
    * way the quantile/centroid collects do. The merge loop itself is
    * driver-side arithmetic over that bounded table (O(nMerges · vocab ·
    * avg word len)); the corpus is never touched again. */
  def bpeMerges(
      docs: DataFrame, nMerges: Int, maxWords: Int = 65536): Seq[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val wordFreq = docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      // split by CODE POINT (the encode kernel's alphabet, Bpe
      // .applyMerges): a UTF-16 split would learn lone-surrogate merges
      // the encoder can never apply — wasted merge budget and a fixture
      // that mangles to '?' on write
      val cps = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
      var i = 0
      while (i < w.length) {
        val cw = Character.charCount(w.codePointAt(i))
        cps += w.substring(i, i + cw); i += cw
      }
      cps += graft.plans.Bpe.Marker
      (cps.toArray, n)
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        round += 1
      }
    }
    merges.result()
  }

  /** BPE piece stream of `text` under `merges` — `array<string>`, one
    * piece per subword token, `</w>`-terminated per word. Per-row codegen'd
    * kernel, zero shuffle ([[graft.plans.Bpe]]). */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.Bpe.bpeEncodeNative(text, merges)

  /** Tokenizer-faithful token count: the piece count of [[bpeEncode]].
    * Drop-in `tokenCount` column for [[Packing.packSequences]] /
    * [[Sampling.tokenQuota]]. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeEncode(text, merges))

  /** Inverse of [[bpeEncode]]: concatenate pieces, turn each end-of-word
    * marker back into the space it replaced, drop the final one. Pure
    * string expressions — decode∘encode ≡ id is oracle-checked corpus-wide
    * (`bpe_roundtrip`). */
  def bpeDecode(pieces: Column): Column = {
    val joined = regexp_replace(
      array_join(pieces, ""), graft.plans.Bpe.Marker, " ")
    // strip exactly one trailing space: every encode emits one marker per
    // word incl. the last, so `joined` always ends in exactly one space
    // (an empty piece array yields "", where substr's -1 length is "")
    joined.substr(lit(1), length(joined) - 1)
  }

  /** Unigram-LM tokenizer encode ([[graft.plans.Unigram]]): text →
    * max-likelihood piece stream under the trained piece probabilities,
    * with the shared `</w>` end-of-word markers — so [[bpeDecode]]
    * inverts it too (`unigram_roundtrip`). */
  def unigramEncode(text: Column, pieces: Seq[(String, Double)]): Column =
    graft.plans.Unigram.unigramEncodeNative(text, pieces)

  /** Tokenizer-faithful token count under the unigram model: piece
    * count of [[unigramEncode]] (markers included, one per word — the
    * same convention as [[bpeTokenCount]]). */
  def unigramTokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    size(unigramEncode(text, pieces))

  /** The checked-in unigram piece fixture (`graft/unigram_pieces.txt`
    * on the classpath, one `piece prob` per line) — trained once from
    * the sf0.001 documents table via [[UnigramTrain.learnedPieces]] and
    * frozen, so the registered unigram queries are deterministic
    * forever (the [[fixtureMerges]] convention). */
  lazy val fixturePieces: Seq[(String, Double)] = {
    val in = getClass.getResourceAsStream("/graft/unigram_pieces.txt")
    require(in != null, "missing classpath resource /graft/unigram_pieces.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val sp = line.lastIndexOf(' ')
      require(sp > 0, s"malformed piece line: '$line'")
      (line.substring(0, sp), line.substring(sp + 1).toDouble)
    }.toList
    finally src.close()
  }

  /** The checked-in merges fixture (`graft/bpe_merges.txt` on the
    * classpath, one `left right` pair per line) — learned once from the
    * sf0.001 documents table via [[bpeMerges]] and frozen, so the
    * registered BPE queries are deterministic forever. */
  lazy val fixtureMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing classpath resource /graft/bpe_merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      require(sp > 0 && sp < line.length - 1, s"malformed merge line: '$line'")
      (line.substring(0, sp), line.substring(sp + 1))
    }.toList
    finally src.close()
  }
}
