package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.{functions => F}

import graft.expr._

/**
 * Public Column API of the engine — the Spark-first replacements for the
 * reference's opaque per-file calls (ocrmypdf.ocr at ocr_combined.py:193-199,
 * BeautifulSoup span selection at :71-82, security preflight at
 * security_validator.py:370-461).
 */
object functions {

  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Main-content text from HTML bytes (boilerplate stripped). */
  def extract_main_content(html: Column): Column =
    ColumnBridge.column(ExtractMainContent(expr(html)))

  /** Layout-aware text from PDF bytes (reading-order reconstruction, pages joined by \f). */
  def parse_pdf_text(bytes: Column): Column =
    ColumnBridge.column(ParsePdfText(expr(bytes)))

  /** Dispatch on payload magic: PDF → parse_pdf_text, else extract_main_content. */
  def extract_any_text(bytes: Column): Column =
    ColumnBridge.column(ExtractAnyText(expr(bytes)))

  /** HTML head metadata: struct(title, canonical, robots, lang, og_title,
    * description) — canonical feeds canonical-URL dedup, robots the
    * noindex gate; absent fields are null. */
  def html_meta(html: Column): Column =
    ColumnBridge.column(HtmlMetaExpr(expr(html)))

  /** Outlinks of an HTML page resolved absolute against its url (RFC 3986
    * §5.2; http/https only; document order; hostile-input capped). */
  def extract_links(html: Column, url: Column): Column =
    ColumnBridge.column(ExtractLinks(expr(html), expr(url)))

  /** RFC 3986 §5.2: resolve `ref` against `base` (meta-refresh targets,
    * redirect locations — refs outside an href). NULL if not http(s). */
  def resolve_url(base: Column, ref: Column): Column =
    ColumnBridge.column(ResolveUrl(expr(base), expr(ref)))

  /** (href, anchor text) structs for the same links — the anchor-text
    * harvest (entity-decoded, whitespace-collapsed, capped). */
  def html_anchors(html: Column, url: Column): Column =
    ColumnBridge.column(HtmlAnchors(expr(html), expr(url)))

  /** Raw JSON-LD (schema.org) block texts of an HTML page, document order;
    * compose with from_json for typed structured data. */
  def ldjson_blocks(html: Column): Column =
    ColumnBridge.column(LdJsonBlocks(expr(html)))

  /** RSS/Atom items — array<struct<title, link, date>> in document order. */
  def feed_items(payload: Column): Column =
    ColumnBridge.column(FeedItems(expr(payload)))

  /** "rss" | "atom" | null — the feed dispatch sniff. */
  def feed_kind(payload: Column): Column =
    ColumnBridge.column(FeedKind(expr(payload)))

  /** RFC 9309: is `path` fetchable for `agent` under `robots` (robots.txt
    * text)? Longest-match rules, wildcard/$ patterns, Allow wins ties. */
  def robots_allowed(robots: Column, agent: Column, path: Column): Column =
    ColumnBridge.column(graft.expr.RobotsAllowed(expr(robots), expr(agent), expr(path)))

  /** `Sitemap:` urls of a robots.txt (file order, deduplicated) — sitemap
    * discovery from the policy fetch the crawler already made. */
  def robots_sitemaps(robots: Column): Column =
    ColumnBridge.column(graft.expr.RobotsSitemaps(expr(robots)))

  /** Effective `Crawl-delay` for `agent` in millis (de-facto politeness
    * directive; decimal seconds, 24 h cap); null when absent. */
  def robots_crawl_delay(robots: Column, agent: Column): Column =
    ColumnBridge.column(graft.expr.RobotsCrawlDelay(expr(robots), expr(agent)))

  /** DEFLATE-compressed byte length (level 6, raw) — the compression-ratio
    * quality signal: ratio = deflate_len/octet_length, low ⇒ repetition. */
  def deflate_len(payload: Column): Column =
    ColumnBridge.column(graft.expr.DeflateLen(expr(payload)))

  /** XML sitemap entries — array<struct<loc, lastmod, changefreq,
    * priority>> in document order (urlset or sitemapindex payloads). */
  def sitemap_entries(payload: Column): Column =
    ColumnBridge.column(SitemapEntries(expr(payload)))

  /** "urlset" | "sitemapindex" | null — the sitemap dispatch sniff. */
  def sitemap_kind(payload: Column): Column =
    ColumnBridge.column(SitemapKind(expr(payload)))

  /** Block-level analysis of HTML: array<struct(idx,tag,text,words,link_words,is_content)>. */
  def extract_blocks(html: Column): Column =
    ColumnBridge.column(ExtractBlocks(expr(html)))

  /** Word spans from PDF bytes: array<struct(page,x1,y1,x2,y2,word)> (hOCR analog). */
  def parse_pdf_spans(bytes: Column): Column =
    ColumnBridge.column(ParsePdfSpans(expr(bytes)))

  /** hOCR word spans from HTML bytes: array<struct(page,x1,y1,x2,y2,word)> —
    * the reference's literal core operator (ocr_combined.py:73-82). */
  def parse_hocr_spans(html: Column): Column =
    ColumnBridge.column(ParseHocrSpans(expr(html)))

  /** Security preflight: struct(is_pdf,version,encrypted,embedded,issues). */
  /** Empty-user-password PDF decryption (standard handler, RC4 V1/V2):
    * clear bytes or NULL — `coalesce(pdf_decrypt(b), b)` recovers the
    * owner-password-only subset of encrypted crawl PDFs. */
  def pdf_decrypt(bytes: Column): Column =
    ColumnBridge.column(PdfDecrypt(expr(bytes)))

  def pdf_preflight(bytes: Column): Column =
    ColumnBridge.column(PdfPreflightExpr(expr(bytes)))

  /** Fused extraction: struct(text, spans) from a single parse — the pipeline's
    * visual/force path (PDF content streams interpreted once, not twice). */
  def extract_doc(bytes: Column): Column =
    ColumnBridge.column(ExtractDoc(expr(bytes)))

  /** Golden digest of extracted text: sha256 hex of UTF-8 bytes
    * (reference checksum analog, security_validator.py:463-472). */
  def text_digest(text: Column): Column =
    F.sha2(F.encode(text, "UTF-8"), 256)

  /** Payload is a PDF iff it starts with "%PDF-" (security_validator.py:377).
    * Binary prefix compare only — never decodes the full payload (SURVEY.md A3). */
  def is_pdf(bytes: Column): Column =
    F.substring(bytes, 1, 5) === F.lit("%PDF-".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Host of a url — the skew/salting key (SURVEY.md §4). try_parse_url, not
    * parse_url: Spark 4's parse_url THROWS on an invalid url (INVALID_URL),
    * and one malformed crawl url must never kill an extraction task — null
    * hosts just share a shuffle key. */
  def url_host(url: Column): Column = F.try_parse_url(url, F.lit("HOST"))

  /** Canonical url for dedup-by-url (the crawl staple BEFORE content dedup:
    * most revisit duplicates differ only in case/fragment/tracking noise):
    * lowercase scheme+authority, default port stripped (:80 http, :443
    * https), fragment dropped, empty path → "/", query params sorted with
    * tracking params (utm_*, fbclid, gclid, ref) removed. Pure codegen'd
    * built-ins (try_parse_url + array ops — parse_url THROWS on malformed
    * urls; here they canonicalize to null), no UDF. */
  def canonical_url(url: Column): Column = {
    val proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    val auth0 = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    val auth = F.when(proto === "http", F.regexp_replace(auth0, ":80$", ""))
      .when(proto === "https", F.regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path = F.coalesce(F.nullif(F.try_parse_url(url, F.lit("PATH")), F.lit("")), F.lit("/"))
    val kept = F.array_sort(F.filter(
      F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") || p === "")))
    val query = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")))
      .otherwise(F.lit(""))
    F.concat(proto, F.lit("://"), auth, path, query)
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the public IA/
    * crawler-commons convention CDX indexes sort by): reversed comma-joined
    * host labels, `)`, path, sorted cleaned query — so one host's captures
    * are CONTIGUOUS under a plain sort and a range partition on the key
    * co-locates per-site work. `com,example)/path?a=1` for
    * `https://www.Example.com/Path?a=1`. Normalization mirrors
    * canonical_url (lowercase, default ports, tracking params, fragment)
    * plus the SURT specifics: leading `www\d*.` label stripped, non-default
    * port kept after the labels, whole key lowercased. Pure codegen'd
    * built-ins; null for non-http(s) or unparseable urls. */
  def surt_url(url: Column): Column = {
    val proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    val auth0 = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    val auth = F.when(proto === "http", F.regexp_replace(auth0, ":80$", ""))
      .when(proto === "https", F.regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val host = F.regexp_replace(auth, ":[0-9]+$", "")
    val port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    val bare = F.regexp_replace(host, "^www[0-9]*\\.", "")
    val rev = F.array_join(F.reverse(F.split(bare, "\\.")), ",")
    val path = F.lower(F.coalesce(
      F.nullif(F.try_parse_url(url, F.lit("PATH")), F.lit("")), F.lit("/")))
    val kept = F.array_sort(F.filter(
      F.split(F.lower(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))), "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") || p === "")))
    val query = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")))
      .otherwise(F.lit(""))
    F.when(proto.isin("http", "https") && auth0.isNotNull && F.length(auth) > 0,
      F.concat(rev,
        F.when(F.length(port) > 0, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"), path, query))
  }

  // ---- large-scale dedup / fingerprinting (graft.text.TextHash semantics) ----

  /** 64-bit SimHash near-dup fingerprint of whitespace-tokenized text. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(expr(text)))

  /** MinHash signature: array<long> of numHashes min-hashes over token shingles. */
  def minhash_sig(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    ColumnBridge.column(MinHashSig(expr(text), numHashes, shingleSize))

  /** LSH band keys (minhash + banding fused): explode to bucket-join near-dup candidates. */
  def minhash_bands(text: Column, numHashes: Int = 64, shingleSize: Int = 3, rowsPerBand: Int = 8): Column =
    ColumnBridge.column(MinHashBands(expr(text), numHashes, shingleSize, rowsPerBand))

  /** Fused minhash: struct(sig, bands) from ONE hashing pass — the corpus-scan
    * shape for generate-then-verify near-dup pipelines (hash once, band-join
    * on `bands`, estimate on `sig`). */
  def minhash_sig_bands(text: Column, numHashes: Int = 64, shingleSize: Int = 3, rowsPerBand: Int = 8): Column =
    ColumnBridge.column(MinHashSigBands(expr(text), numHashes, shingleSize, rowsPerBand))

  /** Winnowing-style document fingerprint (min rolling hash over token n-grams). */
  def rolling_fingerprint(text: Column, n: Int = 8): Column =
    ColumnBridge.column(RollingFingerprint(expr(text), n))

  /** All token n-gram hashes in order (strict windows: < n tokens → empty) —
    * decontamination overlap joins and repetition stats. */
  def ngram_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHashes(expr(text), n))

  /** Real BPE tokens of whitespace-split text under an explicit merge table
    * (lowest rank merges first, leftmost on ties) — the token count a
    * training pipeline budgets by; `bpe_tokens(t, m).size` is that count. */
  def bpe_tokens(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokens(expr(text), merges))

  /** splitmix64 of a long column — deterministic, partition-invariant
    * sampling key (never rand()). */
  def splitmix64(v: Column): Column =
    ColumnBridge.column(SplitMix64(expr(v)))

  /** Exact token-shingle Jaccard (verification pass over LSH candidate pairs). */
  def shingle_jaccard(a: Column, b: Column, k: Int = 3): Column =
    ColumnBridge.column(ShingleJaccard(expr(a), expr(b), k))

  /** Typed metadata from opaque binary media: struct(format, width, height). */
  def media_sniff(bytes: Column): Column =
    ColumnBridge.column(MediaSniffExpr(expr(bytes)))

  /** Media features: array<float>[8]. REAL per-channel mean/variance for the
    * decodable formats (PNG/JPEG/GIF/BMP/TIFF/WebP-lossless images; WAV
    * incl. G.711, FLAC, Ogg/Vorbis audio); deterministic hash-sketch STUB
    * only for the table-data codecs (MP3/AAC/Opus/video — see README). */
  def media_features(bytes: Column): Column =
    ColumnBridge.column(MediaFeatures(expr(bytes)))

  /** 64-bit perceptual difference hash (dHash, 9×8 block grid) for image
    * near-dup dedup — resolution-invariant by construction; NULL for
    * non-image payloads. Definition pinned in MediaSniff.dhash64. */
  def image_dhash(bytes: Column): Column =
    ColumnBridge.column(ImageDhash(expr(bytes)))

  /** Audio/video container metadata: struct(format, duration_ms, sample_rate,
    * channels, width, height) from MP4 boxes / MP3 frame walk / FLAC
    * STREAMINFO / WAV chunks — structure parsing only, no codec decode. */
  def av_meta(bytes: Column): Column =
    ColumnBridge.column(AvMetaExpr(expr(bytes)))

  /** EXIF metadata: struct(orientation, has_gps, make, datetime) from JPEG
    * APP1 or bare TIFF bytes — has_gps is the image-side location-PII flag. */
  def exif_meta(bytes: Column): Column =
    ColumnBridge.column(ExifMetaExpr(expr(bytes)))

  /** REAL Vorbis payload decode: struct(sample_rate, channels, n_samples,
    * n_packets, floor_y_sum, sum_abs_micro, peak_micro) — in-band codebook
    * Huffman decode, floor1 synthesis, residue VQ, iMDCT, lapped windows
    * (VorbisDecode). NULL for non-Vorbis payloads. */
  def vorbis_features(bytes: Column): Column =
    ColumnBridge.column(VorbisFeaturesExpr(expr(bytes)))

  /** True iff `host` (lowercased by the caller) equals or is a subdomain of
    * any broadcast domain — the blocklist gate's scale shape (hash-set probe
    * per row; the list ships once per executor, never as plan nodes). */
  def host_in_domain_set(host: Column, domains: org.apache.spark.broadcast.Broadcast[Array[String]]): Column =
    ColumnBridge.column(HostInDomainSet(expr(host), domains))

  /** True iff the string contains ANY broadcast pattern — Aho-Corasick,
    * O(length) per row at any pattern count (vs O(patterns·length) for a
    * `contains` chain). */
  def contains_any_pattern(s: Column, patterns: org.apache.spark.broadcast.Broadcast[Array[String]]): Column =
    ColumnBridge.column(ContainsAnyPattern(expr(s), patterns))

  /** Language ID: struct(lang, score_micro) — char-bigram Naive Bayes over
    * 11 languages / 4 scripts (graft.text.LangId), integer micro-nat scores
    * so oracles replay predictions bit-for-bit. */
  def lang_id(text: Column): Column =
    ColumnBridge.column(LangIdExpr(expr(text)))

  /** Whitespace tokens by the TextHash.tokenBounds contract
    * (Character.isWhitespace — the SAME tokenizer ngram_hashes positions are
    * counted in; a regex "\\s+" split disagrees on Unicode whitespace). */
  def ws_tokens(text: Column): Column =
    ColumnBridge.column(WsTokens(expr(text)))

  /** Cosine similarity of two array<double> embedding columns — a native
    * codegen'd expression (one fused loop). The earlier builtin-composition
    * form (aggregate+zip_with ×3) was interpreted per pair and dominated the
    * LSH verify stage; values are bit-identical on the embedding contract
    * (equal-width, non-null elements). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(expr(a), expr(b)))
}
