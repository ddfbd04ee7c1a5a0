"""Web-ingest URL operators: canonicalization, host/domain
extraction, exact URL dedup, outlink extraction / domain link graph.

Extension (no reference counterpart) — the front door of a
web-corpus training pipeline (CommonCrawl-style): before any text
dedup runs, the crawl is deduplicated on CANONICAL URL (the same
page arrives with tracking parameters, fragments, case-variant
hosts, and default ports), and per-registrable-domain statistics
drive source weighting and domain blocklists.

Everything here is a pure whole-stage-codegen projection (``lower``
/ ``regexp_replace`` / ``regexp_extract`` chains — no UDF, no
shuffle), so canonicalization composes with scan-time pruning at
any corpus size; the only shuffle in :func:`url_dedup` is the
one ``groupBy(canonical_url)`` any exact dedup needs.  The regex
rules are deliberately engine-portable (no lookbehind, no
backreferences) so a DuckDB oracle replays them verbatim.

Canonicalization rules (documented contract, applied in order):

1. strip the fragment (``#...``),
2. lowercase the scheme and host (never path or query),
3. drop the default port (``:80`` for http, ``:443`` for https),
4. remove tracking query parameters (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``), preserving the order of the rest, and
   dropping a now-empty ``?``/trailing ``&``.

``registrable_domain`` is a HEURISTIC eTLD+1 (last two host labels,
or three when the public suffix is a known two-label one like
``co.uk``).  For exact semantics, feed
:func:`with_registrable_domain` a Public Suffix List snapshot:
:func:`load_public_suffixes` parses the standard PSL file format,
and a fixture-scale snapshot ships with the package
(``ons_utils_spark/data/public_suffix_snapshot.dat``) so the exact
path works out of the box — production deployments should point it
at a full, current snapshot.
"""
from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ['canonicalize_url', 'url_host', 'registrable_domain',
           'with_registrable_domain', 'load_public_suffixes',
           'PSL_SNAPSHOT_PATH', 'url_dedup',
           'extract_links', 'extract_anchors',
           'outlink_domain_edges', 'anchor_texts', 'sniff_mime',
           'crawl_diff', 'parse_sitemap', 'extract_html_meta',
           'parse_cdx',
           'extract_hreflang', 'crawl_frontier', 'fetch_schedule',
           'TRACKING_PARAM_RE', 'TWO_LABEL_SUFFIXES']

# key pattern of query parameters dropped by canonicalization
TRACKING_PARAM_RE = r'(?:utm_[^=&#]*|fbclid|gclid|msclkid)'

# two-label public suffixes the domain heuristic knows about
TWO_LABEL_SUFFIXES = ('co.uk', 'org.uk', 'ac.uk', 'gov.uk',
                      'com.au', 'net.au', 'co.jp', 'co.in',
                      'com.br', 'co.nz')


def canonicalize_url(url) -> Column:
    """Canonical form of ``url`` per the module-docstring rules —
    one codegen'd expression chain, no UDF."""
    u = F.col(url) if isinstance(url, str) else url
    # 1. fragment off first (ports/params never hide behind it)
    u = F.regexp_replace(u, '#.*$', '')
    # 2. lowercase scheme://host[:port] only: the authority ends at
    # the first '/', '?' or '#' (a URL with a query but no path —
    # 'HTTPS://X.com?id=3' — must NOT fold the query into the
    # lowercased prefix; rule 2 says never path or query), then
    # recombine
    prefix = F.lower(F.regexp_extract(u, '^([^/]*//[^/?#]+)', 1))
    rest = F.regexp_replace(u, '^[^/]*//[^/?#]+', '')
    # 3. default ports (scheme-specific)
    prefix = F.regexp_replace(prefix, '^(https://[^:/]+):443$', '$1')
    prefix = F.regexp_replace(prefix, '^(http://[^:/]+):80$', '$1')
    u = F.concat(prefix, rest)
    # 4. tracking params: interior '&k=v' first, then a leading
    # '?k=v&' (promote the next param), then a lone '?k=v' tail;
    # finally sweep a dangling '?'/'&'.
    u = F.regexp_replace(u, f'&{TRACKING_PARAM_RE}=[^&#]*', '')
    u = F.regexp_replace(u, rf'\?{TRACKING_PARAM_RE}=[^&#]*&', '?')
    u = F.regexp_replace(u, rf'\?{TRACKING_PARAM_RE}=[^&#]*$', '')
    u = F.regexp_replace(u, '[?&]$', '')
    return u


def url_host(url) -> Column:
    """Lowercased host (no port) of ``url``."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(u, '^[^/]*//([^/:?#]+)', 1))


def registrable_domain(url) -> Column:
    """Heuristic eTLD+1 of ``url``'s host (see module docstring)."""
    two_label = '|'.join(s.replace('.', r'\.')
                         for s in TWO_LABEL_SUFFIXES)
    return F.regexp_extract(
        url_host(url),
        rf'([^.]+\.(?:{two_label})|[^.]+\.[^.]+)$', 1)


#: Bundled fixture-scale Public Suffix List snapshot (PSL file
#: format, curated subset of https://publicsuffix.org/list/).
PSL_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'data', 'public_suffix_snapshot.dat')


def load_public_suffixes(path: str = None) -> frozenset:
    """Parse a Public Suffix List file into the plain-suffix set
    :func:`with_registrable_domain` consumes.

    ``path`` defaults to the bundled fixture-scale snapshot
    (:data:`PSL_SNAPSHOT_PATH`); pass a full, current snapshot in
    production.  Standard PSL format: one rule per line, ``//``
    comments, blanks ignored, rules end at the first whitespace.
    Wildcard (``*.ck``) and exception (``!www.ck``) rules are
    SKIPPED — the broadcast matcher evaluates plain rules only
    (its documented contract); hosts under a skipped wildcard fall
    back to the PSL ``*`` default (last two labels), which for the
    handful of wildcard TLDs is the pre-PSL behavior, not silent
    misparsing.  The result is a driver-side frozenset, KiB-scale
    even for the full list — it parameterizes broadcast joins, it
    never ships rows.
    """
    out = set()
    with open(path or PSL_SNAPSHOT_PATH, encoding='utf-8') as fh:
        for line in fh:
            rule = line.strip().split()[0] if line.strip() else ''
            if (not rule or rule.startswith('//')
                    or rule.startswith('*') or rule.startswith('!')):
                continue
            out.add(rule.lower().strip('.'))
    return frozenset(out)


def with_registrable_domain(df, url_col: str, out_col: str = 'domain',
                            suffixes=None, max_suffix_labels: int = 5):
    """``df`` + an ``out_col`` column holding each URL's eTLD+1.

    With ``suffixes=None`` this is the module's codegen heuristic
    (:func:`registrable_domain`).  Passing ``suffixes`` — an iterable
    of public suffixes, e.g. a Public Suffix List snapshot
    (``'com'``, ``'co.uk'``, ``'com.cn'``, private suffixes like
    ``'github.io'``) — switches to exact longest-match semantics:
    the registrable domain is one label plus the LONGEST matching
    suffix; a host that IS a public suffix has no registrable domain
    (``''``), and an unmatched host falls back to its last two
    labels (the PSL ``*`` default rule).

    Scale shape: one BROADCAST hash join per suffix label-count
    (``max_suffix_labels``, so <= 5 by default — real PSL rules stop
    at 5 labels), each probing the tiny suffix table with the host's
    last-k-labels key.  Zero shuffles, no UDF, and the whole chain
    stays inside whole-stage codegen — at 100 TB this is a
    map-side-only projection, unlike an exploded-candidates
    group-back (two shuffles of the corpus).  Wildcard (``*.ck``)
    and exception (``!www.ck``) PSL rules are out of scope — expand
    them into the plain set before passing.
    """
    if suffixes is None:
        return df.withColumn(out_col, registrable_domain(url_col))
    spark = df.sparkSession
    cleaned = {s.strip().strip('.').lower() for s in suffixes}
    cleaned.discard('')
    by_k: dict = {}
    for s in cleaned:
        by_k.setdefault(s.count('.') + 1, set()).add(s)
    too_long = {k for k in by_k if k > max_suffix_labels}
    if too_long:
        raise ValueError(
            f'suffixes with more than max_suffix_labels='
            f'{max_suffix_labels} labels: '
            f'{sorted(by_k[k].pop() for k in too_long)} — raise '
            'max_suffix_labels to cover them')
    host = url_host(url_col)
    labels = F.split(host, r'\.')
    n = F.size(labels)
    out = (df.withColumn('__rd_host', host)
           .withColumn('__rd_labels', labels))
    ks = sorted(by_k)
    for k in ks:
        tbl = spark.createDataFrame(
            [(s,) for s in sorted(by_k[k])], f'__rd_sfx{k} string')
        cand = F.when(
            n >= k,
            F.array_join(F.slice('__rd_labels', n - k + 1, k), '.'))
        out = out.withColumn(f'__rd_cand{k}', cand).join(
            F.broadcast(tbl),
            F.col(f'__rd_cand{k}') == F.col(f'__rd_sfx{k}'), 'left')
    # longest matching suffix wins: wrap ascending so the outermost
    # CASE branch is the largest k; fallback = last two labels
    # (PSL '*' default; '' for single-label hosts, matching the
    # heuristic)
    expr = F.regexp_extract(F.col('__rd_host'), r'([^.]+\.[^.]+)$', 1)
    for k in ks:
        m = F.col(f'__rd_sfx{k}')
        dom_k = F.when(
            m == F.col('__rd_host'), F.lit('')  # host IS a suffix
        ).otherwise(F.concat(F.element_at('__rd_labels', n - k),
                             F.lit('.'), m))
        expr = F.when(m.isNotNull(), dom_k).otherwise(expr)
    drop = (['__rd_host', '__rd_labels']
            + [c for k in ks for c in (f'__rd_cand{k}',
                                       f'__rd_sfx{k}')])
    return out.withColumn(out_col, expr).drop(*drop)


def _tag_attr(t, name: str):
    """Value of attribute ``name`` inside one tag snippet ``t``,
    regardless of attribute ORDER and of single- vs double-QUOTING
    (real-world HTML violates both constantly; requiring
    double-quotes-in-fixed-order silently drops a large fraction of
    a real crawl).  Two codegen ``regexp_extract`` passes coalesced
    — the double-quoted form first, so values may contain the other
    quote character — NULL when the attribute is absent or empty.
    Patterns are RE2-safe (no lookaround/backreferences) so any
    engine replays them.
    """
    dq = F.regexp_extract(t, rf'(?is)\b{name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(t, rf"(?is)\b{name}\s*=\s*'([^']*)'", 1)
    return F.nullif(
        F.when(dq != '', dq).otherwise(sq), F.lit(''))


def _attr_is(t, name: str, value: str):
    """True when tag snippet ``t`` carries ``name="<value>"`` (either
    quoting, any attribute position, case-insensitive value)."""
    return t.rlike(
        rf'(?is)\b{name}\s*=\s*["\']{value}["\']')


def extract_links(html) -> Column:
    """All ``href=...`` targets of an HTML page, in document order
    (``array<string>``) — one ``regexp_extract_all`` plus a
    quote-stripping ``transform``, all inside whole-stage codegen,
    no UDF.

    Both quoting styles are accepted (``href="u"`` / ``href='u'``,
    any attribute position); unquoted attributes and
    ``srcset``-style multi-URL attributes are out of scope.  The
    patterns are engine-portable (no lookbehind) so an oracle
    replays them verbatim.
    """
    h = F.col(html) if isinstance(html, str) else html
    raw = F.regexp_extract_all(
        h, F.lit('(?i)\\bhref\\s*=\\s*("[^"]*"|\'[^\']*\')'), 1)
    return F.transform(
        raw, lambda v: F.regexp_replace(v, '^["\']|["\']$', ''))


def extract_anchors(html) -> Column:
    """``(url, text)`` pairs of every simple anchor element —
    ``array<struct<url:string, text:string>>`` in document order.

    Two chained codegen regex passes, no UDF: extract whole
    ``<a ...>text</a>`` snippets, keep those carrying an ``href``
    (either quoting, any attribute position), then split each into
    its href and inner text.  The inner text must be markup-free
    (``[^<]*`` — nested elements end the capture), the standard
    shape of link text in the wild.
    """
    h = F.col(html) if isinstance(html, str) else html
    snippet = r'<a\s[^>]*>[^<]*</a>'
    tags = F.filter(
        F.regexp_extract_all(h, F.lit(f'(?i)({snippet})'), 1),
        lambda t: t.rlike(
            '(?is)\\bhref\\s*=\\s*("[^"]*"|\'[^\']*\')'))
    return F.transform(
        tags,
        lambda t: F.struct(
            _tag_attr(t, 'href').alias('url'),
            F.regexp_extract(t, '(?is)>([^<]*)</a>$', 1)
            .alias('text')))


def anchor_texts(df, html_col: str):
    """Aggregate anchor text per canonical target URL:
    ``(target_url, n_anchors, texts)`` with ``texts`` the sorted
    distinct anchor strings — the classic weak-supervision signal
    for retrieval/query-document training pairs.

    One explode + one ``groupBy(target_url)`` (map-side partials;
    ``collect_set`` is bounded by distinct anchor wording per
    target, which plateaus in real link graphs — cap upstream if an
    adversarial target worries you).
    """
    pair = F.explode(extract_anchors(html_col)).alias('__a')
    return (
        df.select(pair)
        .select(
            canonicalize_url(F.col('__a.url')).alias('target_url'),
            F.col('__a.text').alias('__t'))
        .groupBy('target_url')
        .agg(F.count(F.lit(1)).alias('n_anchors'),
             F.array_sort(F.collect_set('__t')).alias('texts'))
    )


def outlink_domain_edges(df, src_url_col: str, html_col: str):
    """The domain-level link graph of a crawled page set:
    ``(src_domain, dst_domain, n_links)`` — the input PageRank /
    source-weighting wants.

    Plan shape: extract links (codegen array), explode, canonicalize
    both endpoints, reduce to registrable domains, and aggregate with
    one ``groupBy(src_domain, dst_domain)`` — the ONLY shuffle, with
    map-side partials, keyed by the (small) domain-pair space rather
    than pages.  Self-links are kept (callers drop them if their
    graph is loop-free); pages with no links contribute nothing
    (explode drops empty arrays).
    """
    dst = F.explode(extract_links(html_col)).alias('__dst_url')
    return (
        df.select(
            registrable_domain(src_url_col).alias('src_domain'), dst)
        .select('src_domain',
                registrable_domain(
                    canonicalize_url('__dst_url')).alias('dst_domain'))
        .groupBy('src_domain', 'dst_domain')
        .agg(F.count(F.lit(1)).alias('n_links'))
    )


def sniff_mime(payload) -> Column:
    """Content-type triage of a raw crawl payload (``binary``) by
    magic bytes — the first routing decision after WARC ingest
    (HTML → text extraction, images/audio/video → the multimodal
    decoders, archives → decompression, rest → quarantine).

    Pure whole-stage codegen: one hex prefix + a few byte-range
    compares, no UDF — at 100 TB this rides the scan.  Recognized:
    pdf, jpeg, png, gif, webp, wav, avi, mp4 (``ftyp`` at offset 4),
    ogg, flac, mp3 (ID3), gzip, zip, html/xml (case-insensitive
    ``<!doctype`` / ``<html`` / ``<?xml``), else ``text/plain`` when
    the UTF-8 decode of the first 32 bytes holds no control or
    replacement characters, else ``application/octet-stream``.
    NULL payloads stay NULL.

    The 32-byte text window is trimmed back to the last COMPLETE
    UTF-8 sequence before decoding: a multi-byte character
    straddling the boundary would otherwise decode to U+FFFD and
    misroute non-ASCII plain text (the dominant case in a
    multilingual crawl) to octet-stream.  UTF-8 lead bytes (hex
    ``C``–``F``) and continuation bytes (hex ``8``–``B``) are
    disjoint in their first hex digit, so one anchored
    ``regexp_replace`` on the window's hex drops exactly the
    trailing incomplete sequence and nothing else.
    """
    p = F.col(payload) if isinstance(payload, str) else payload
    hx = F.hex(F.substring(p, 1, 8))
    sub = F.substring(p, 5, 4).cast('string')
    head = F.lower(F.substring(p, 1, 9).cast('string'))
    # Drop a trailing incomplete multi-byte sequence: a 2/3/4-byte
    # lead with fewer continuation bytes than it requires.  Complete
    # sequences never match (their trailing bytes start 8-B, the
    # alternatives all require a C-F lead at the match start).
    hex_head = F.regexp_replace(
        F.hex(F.substring(p, 1, 32)),
        '(?:[CD][0-9A-F]'
        '|E[0-9A-F](?:[89AB][0-9A-F])?'
        '|F[0-9A-F](?:[89AB][0-9A-F]){0,2})$',
        '')
    text_head = F.unhex(hex_head).cast('string')
    printable = F.regexp_count(
        text_head, F.lit('[\x00-\x08\x0b\x0c\x0e-\x1f�]')) == 0
    return (
        F.when(p.isNull(), F.lit(None).cast('string'))
        .when(hx.startswith('25504446'), 'application/pdf')
        .when(hx.startswith('FFD8FF'), 'image/jpeg')
        .when(hx.startswith('89504E47'), 'image/png')
        .when(hx.startswith('47494638'), 'image/gif')
        .when(hx.startswith('52494646')
              & (F.substring(p, 9, 4).cast('string') == 'WEBP'),
              'image/webp')
        .when(hx.startswith('52494646')
              & (F.substring(p, 9, 4).cast('string') == 'WAVE'),
              'audio/wav')
        .when(hx.startswith('52494646')
              & (F.substring(p, 9, 4).cast('string') == 'AVI '),
              'video/x-msvideo')
        .when(sub == 'ftyp', 'video/mp4')
        .when(hx.startswith('4F676753'), 'application/ogg')
        .when(hx.startswith('664C6143'), 'audio/flac')
        .when(hx.startswith('494433'), 'audio/mpeg')
        .when(hx.startswith('1F8B'), 'application/gzip')
        .when(hx.startswith('504B0304'), 'application/zip')
        .when(head.startswith('<!doctype')
              | head.startswith('<html'), 'text/html')
        .when(head.startswith('<?xml'), 'application/xml')
        .when(printable, 'text/plain')
        .otherwise('application/octet-stream')
    )


def crawl_diff(old, new, key_col: str = 'url',
               fingerprint_col: str = 'fingerprint'):
    """Diff two crawl snapshots by page key: ``(key, status,
    old_fingerprint, new_fingerprint)`` with status in
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the
    incremental-recrawl planner's input (fetch budget goes to
    changed+added; removed keys retire from the frontier).

    One full outer join on the key — the single shuffle any
    snapshot comparison needs; both sides arrive pre-deduplicated
    (run :func:`url_dedup` first), and at 100 TB the join co-locates
    if both snapshots are bucketed by key on disk
    (``sources.bucketing``).  Keys must be non-NULL; fingerprints
    may be NULL (a fetch error) and compare null-safely.
    """
    o = old.select(F.col(key_col).alias('__k'),
                   F.col(fingerprint_col).alias('old_fingerprint'))
    n = new.select(F.col(key_col).alias('__k'),
                   F.col(fingerprint_col).alias('new_fingerprint'),
                   F.lit(True).alias('__in_new'))
    joined = o.withColumn('__in_old', F.lit(True)).join(
        n, '__k', 'full_outer')
    status = (
        F.when(F.col('__in_old').isNull(), 'added')
        .when(F.col('__in_new').isNull(), 'removed')
        .when(F.col('old_fingerprint').eqNullSafe(
            F.col('new_fingerprint')), 'unchanged')
        .otherwise('changed'))
    return joined.select(
        F.col('__k').alias(key_col), status.alias('status'),
        'old_fingerprint', 'new_fingerprint')


def url_dedup(df, url_col: str, order_col: str):
    """Exact dedup on canonical URL, keeping the earliest row by
    ``order_col`` (min — the crawl-order winner): returns
    ``(canonical_url, <order_col>, n_dups)``.

    One shuffle (the canonical-key groupBy with map-side partials);
    at 100 TB this is the standard first-pass crawl dedup and the
    canonical key is computed in the scan stage's projection.
    """
    canon = canonicalize_url(url_col).alias('canonical_url')
    return (
        df.select(canon, F.col(order_col))
        .groupBy('canonical_url')
        .agg(F.min(order_col).alias(order_col),
             F.count(F.lit(1)).alias('n_dups'))
    )


def parse_sitemap(df, xml_col: str = 'xml',
                  url_col: str = 'sitemap_url'):
    """Flatten sitemap XML files into one row per referenced URL:
    ``(<url_col>, kind, loc, lastmod, changefreq, priority)`` with
    ``kind`` in ``('urlset', 'sitemapindex')`` — the discovery
    companion to :mod:`~ons_utils_spark.operators.robots` (robots
    ``Sitemap:`` lines point here; sitemap indexes point at more
    sitemaps; urlsets point at pages).

    Pure codegen, same design as :func:`extract_links`: one
    ``regexp_extract_all`` per block kind (``<url>``/``<sitemap>``
    elements, ``(?s)`` so blocks span lines), ``posexplode`` to
    preserve document order, then per-field ``regexp_extract``.  A
    sitemap file is MiB-bounded by spec (50k URLs), so the explode
    multiplies rows but never payload-scale bytes.  Engine-portable
    patterns (no backreferences — RE2-safe): a DuckDB oracle
    replays them verbatim.  Fields absent from an entry are NULL
    (``priority`` cast to double); ``lastmod``/``changefreq`` never
    appear under ``sitemapindex`` entries' spec but parse fine if
    present.
    """
    x = F.col(xml_col)
    rows = []
    for kind, tag in (('urlset', 'url'), ('sitemapindex', 'sitemap')):
        blocks = F.regexp_extract_all(
            x, F.lit(f'(?s)<{tag}>(.*?)</{tag}>'), 1)
        rows.append(
            df.select(F.col(url_col),
                      F.lit(kind).alias('kind'),
                      F.posexplode(blocks).alias('pos', '__b')))
    out = rows[0].unionByName(rows[1])

    def field(name):
        return F.nullif(
            F.regexp_extract(
                F.col('__b'), rf'(?s)<{name}>\s*(.*?)\s*</{name}>',
                1),
            F.lit(''))

    return out.select(
        url_col, 'kind', 'pos',
        field('loc').alias('loc'),
        field('lastmod').alias('lastmod'),
        field('changefreq').alias('changefreq'),
        field('priority').cast('double').alias('priority'))


def extract_html_meta(html) -> Column:
    """Head metadata of an HTML page as a struct ``(title,
    description, canonical_url, lang)`` — the fields a crawl
    pipeline indexes before any body-text processing (titles feed
    search/dedup signals, canonical links feed URL dedup, ``lang``
    attributes feed language routing ahead of content language-ID).

    One codegen projection, no UDF — tag snippets are extracted
    first, then independent per-attribute regexes
    (:func:`_tag_attr`), so attribute ORDER and single- vs
    double-QUOTING don't drop data (real HTML violates the
    serializer-order/double-quote conventions constantly).  Title
    text must be markup-free; case-insensitive tags; absent fields
    NULL; the FIRST matching tag wins when a page repeats one.
    """
    h = F.col(html) if isinstance(html, str) else html

    def first_tag(tag: str, pred):
        snips = F.regexp_extract_all(
            h, F.lit(rf'(?is)(<{tag}\b[^>]*>)'), 1)
        return F.try_element_at(F.filter(snips, pred), F.lit(1))

    meta_desc = first_tag(
        'meta', lambda t: _attr_is(t, 'name', 'description'))
    link_canon = first_tag(
        'link', lambda t: _attr_is(t, 'rel', 'canonical'))
    html_tag = F.try_element_at(
        F.regexp_extract_all(h, F.lit(r'(?is)(<html\b[^>]*>)'), 1),
        F.lit(1))
    return F.struct(
        F.nullif(
            F.regexp_extract(
                h, r'(?is)<title[^>]*>\s*([^<]*?)\s*</title>', 1),
            F.lit('')).alias('title'),
        _tag_attr(meta_desc, 'content').alias('description'),
        _tag_attr(link_canon, 'href').alias('canonical_url'),
        _tag_attr(html_tag, 'lang').alias('lang'),
    )


def crawl_frontier(
    df,
    url_col: str = 'url',
    host_col: str = 'host',
    priority_col=None,
    per_host_per_wave: int = 4,
    max_per_host: 'int | None' = 10_000,
):
    """Politeness-scheduled fetch order for a crawl frontier:
    ``(<url_col>, <host_col>, slot, wave)`` — ``slot`` is the URL's
    1-based rank within its host (highest ``priority_col`` first,
    URL as the deterministic tie-break), ``wave`` the 0-based fetch
    round under at most ``per_host_per_wave`` same-host fetches per
    round.  This is the standard frontier shape (Mercator-style
    host queues): politeness is PER HOST, so scheduling is a
    per-host ranking, never a global sort.

    One shuffle (the host-keyed window).  Per-host row counts bound
    the window state; ``max_per_host`` (default 10k) caps runaway
    hosts — a crawl that wants more of one host re-enqueues next
    cycle — keeping the worst window partition bounded by design
    rather than by corpus luck.  Pass ``None`` to disable.
    """
    from pyspark.sql import Window

    prio = (F.col(priority_col) if isinstance(priority_col, str)
            else priority_col)
    order = ([prio.desc()] if priority_col is not None else []) \
        + [F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    out = (df.withColumn('slot', F.row_number().over(w))
           .withColumn(
               'wave',
               ((F.col('slot') - 1) / per_host_per_wave)
               .cast('long')))
    if max_per_host is not None:
        out = out.where(F.col('slot') <= max_per_host)
    return out.select(url_col, host_col, 'slot', 'wave')


def extract_hreflang(html) -> Column:
    """All ``<link rel="alternate" hreflang="..." href="...">``
    pairs of a page — ``array<struct<lang:string, href:string>>``
    in document order.  This is the URL-alignment signal for
    mining multilingual page pairs (the STRAND recipe, Resnik &
    Smith 2003): pages declaring each other as language alternates
    are candidate bitext BEFORE any content scoring, so the
    embedding miner (``similarity.bitext_mine``) starts from
    page-aligned candidates instead of the full cross product.

    Two chained codegen regex passes like :func:`extract_anchors`
    (ALL ``<link>`` snippets first, then a predicate filter plus
    independent per-attribute extracts) — no UDF, no shuffle, and
    no attribute-order or quoting requirement: ``rel``/``hreflang``/
    ``href`` may appear in any order, single- or double-quoted
    (real-world serializers emit both).
    """
    h = F.col(html) if isinstance(html, str) else html
    tags = F.filter(
        F.regexp_extract_all(
            h, F.lit(r'(?is)(<link\b[^>]*>)'), 1),
        lambda t: (_attr_is(t, 'rel', 'alternate')
                   & t.rlike(r'(?is)\bhreflang\s*=')))
    return F.transform(
        tags,
        lambda t: F.struct(
            _tag_attr(t, 'hreflang').alias('lang'),
            _tag_attr(t, 'href').alias('href')))


def fetch_schedule(
    frontier,
    delays,
    host_col: str = 'host',
    delay_col: str = 'crawl_delay',
    slot_col: str = 'slot',
):
    """Politeness-timed fetch plan: the :func:`crawl_frontier`
    ranking joined with per-host ``robots.crawl_delays`` rates —
    each URL gets ``fetch_at_sec = (slot - 1) × crawl_delay``, the
    earliest time a crawler honoring the host's policy may issue
    that request (sequential per-host fetching at the declared
    rate).  This closes the crawl-scheduling story: robots rules →
    frontier ranking → an actual TIMELINE a fetch fleet can
    execute against.

    Scale shape: ``delays`` is one row per HOST (tiny next to the
    frontier) and is explicitly broadcast — the frontier never
    reshuffles; the arithmetic is a scan projection.  Hosts absent
    from ``delays`` get NULL ``fetch_at_sec`` (schedule them only
    after their policy is known — an unfetched robots.txt is not
    permission).
    """
    d = delays.select(
        F.col(host_col).alias(host_col),
        F.col(delay_col).cast('double').alias('__delay'))
    return (
        frontier
        .join(F.broadcast(d), host_col, 'left')
        .withColumn(
            'fetch_at_sec',
            (F.col(slot_col) - 1).cast('double') * F.col('__delay'))
        .drop('__delay'))


def quality_blocklist(
    df: SparkDF,
    domain_col: str = 'domain',
    pass_col: str = 'quality_pass',
    min_docs: int = 3,
    max_fail_num: int = 1,
    max_fail_den: int = 4,
) -> SparkDF:
    """Domain-level quality census + blocklist derivation (the
    RefinedWeb / FineWeb URL-filtering shape): aggregate a per-page
    boolean quality verdict (``gopher_pass``, ``c4_pass``, a
    classifier cut — anything) up to its domain, and block every
    domain whose failure rate exceeds ``max_fail_num /
    max_fail_den`` once at least ``min_docs`` pages have been seen —
    the evidence floor that stops one bad page from banning a
    one-page domain.

    Returns one row per domain: ``(domain, n_docs, n_fail,
    blocked)``.  The ratio test is the integer cross-multiplication
    ``n_fail × den > n_docs × num`` — no float division, bit-exact
    on any engine (``q_domain_blocklist``).

    Scale shape: ONE domain-keyed count aggregate (map-side
    combinable) over the corpus; the output is domains-sized, small
    enough to broadcast back against the crawl as the actual filter
    (``df.join(broadcast(blocked_domains), domain_col,
    'left_anti')``).
    """
    if min_docs < 1:
        raise ValueError(f'min_docs must be >= 1, got {min_docs!r}')
    if max_fail_num < 0 or max_fail_den < 1:
        raise ValueError(
            'max_fail ratio must be >= 0 with positive denominator: '
            f'{max_fail_num}/{max_fail_den}')
    agg = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias('n_docs'),
        F.sum(F.when(F.col(pass_col), 0).otherwise(1))
        .alias('n_fail'))
    return agg.withColumn(
        'blocked',
        (F.col('n_docs') >= min_docs)
        & (F.col('n_fail') * max_fail_den
           > F.col('n_docs') * max_fail_num))


def parse_cdx(df, line_col: str = 'line'):
    """Parse CDXJ index lines — the Common Crawl / web-archive URL
    index format, ``<SURT urlkey> <14-digit timestamp> <JSON>`` — into
    typed columns: ``(urlkey, ts, url, mime, status, digest, length,
    warc_offset, filename)``.  The CC index is the front door of a
    crawl pipeline: fetch selection, dedup-by-digest, and WARC byte-
    range reads all start from these lines, long before any payload
    is touched.

    Pure codegen: two ``split``-with-limit cuts for the space-
    delimited head plus ONE ``from_json`` (JVM Jackson, no UDF) for
    the JSON tail; numeric fields arrive as JSON strings per the CDXJ
    convention and are cast here, and the timestamp parses as UTC
    ``yyyyMMddHHmmss``.  Scale: a projection on the line scan — no
    shuffle, no explode; at 100 TB the index shards read as plain
    text/gzip splits and every field resolves in the scan stage.
    Malformed lines (fewer than three fields, or a JSON tail Jackson
    rejects) yield NULL parsed fields rather than failing the scan —
    filter ``url IS NULL`` to quarantine them.
    """
    parts = F.split(F.col(line_col), ' ', 3)
    j = F.from_json(
        F.element_at(parts, 3),
        'url string, mime string, status string, digest string,'
        ' length string, offset string, filename string')
    return df.select(
        F.element_at(parts, 1).alias('urlkey'),
        F.to_timestamp(F.element_at(parts, 2), 'yyyyMMddHHmmss')
        .alias('ts'),
        j['url'].alias('url'),
        j['mime'].alias('mime'),
        j['status'].cast('int').alias('status'),
        j['digest'].alias('digest'),
        j['length'].cast('bigint').alias('length'),
        j['offset'].cast('bigint').alias('warc_offset'),
        j['filename'].alias('filename'))
