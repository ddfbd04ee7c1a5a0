"""Tests for web-ingest URL operators (operators/web.py)."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import web


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], 'url string')
    rows = df.select(
        web.canonicalize_url('url').alias('c'),
        web.url_host('url').alias('h'),
        web.registrable_domain('url').alias('d'),
    ).collect()
    return [(r['c'], r['h'], r['d']) for r in rows]


CASES = [
    # (input, canonical, host, domain)
    ('HTTPS://WWW.Example.COM:443/A/b?x=1#frag',
     'https://www.example.com/A/b?x=1', 'www.example.com',
     'example.com'),
    ('http://Site.org:80/p', 'http://site.org/p', 'site.org',
     'site.org'),
    # non-default port survives
    ('https://a.example.com:8080/p', 'https://a.example.com:8080/p',
     'a.example.com', 'example.com'),
    # :80 on https / :443 on http are NOT default — kept
    ('https://a.b.com:80/', 'https://a.b.com:80/', 'a.b.com',
     'b.com'),
    ('http://a.b.com:443/', 'http://a.b.com:443/', 'a.b.com',
     'b.com'),
    # tracking params: leading, interior, trailing, lone
    ('https://x.com/p?utm_source=f&id=3', 'https://x.com/p?id=3',
     'x.com', 'x.com'),
    ('https://x.com/p?id=3&utm_campaign=c&y=2',
     'https://x.com/p?id=3&y=2', 'x.com', 'x.com'),
    ('https://x.com/p?id=3&gclid=zz', 'https://x.com/p?id=3',
     'x.com', 'x.com'),
    ('https://x.com/p?utm_medium=rss', 'https://x.com/p', 'x.com',
     'x.com'),
    ('https://x.com/p?utm_a=1&utm_b=2&fbclid=q', 'https://x.com/p',
     'x.com', 'x.com'),
    # path/query case preserved; only scheme+host lowercase
    ('HtTp://MiXeD.Org/KeEp/CaSe?Q=Vv', 'http://mixed.org/KeEp/CaSe?Q=Vv',
     'mixed.org', 'mixed.org'),
    # fragment alone
    ('https://x.com/p#only', 'https://x.com/p', 'x.com', 'x.com'),
    # two-label public suffix -> three-label registrable domain
    ('https://news.bbc.co.uk/story', 'https://news.bbc.co.uk/story',
     'news.bbc.co.uk', 'bbc.co.uk'),
    ('https://shop.foo.com.au/', 'https://shop.foo.com.au/',
     'shop.foo.com.au', 'foo.com.au'),
    # bare single-label host: no registrable domain
    ('http://localhost:8080/x', 'http://localhost:8080/x',
     'localhost', ''),
    # query with NO path: the authority ends at '?' — the query must
    # keep its case (rule 2: never path or query) and default-port
    # stripping must still fire (r12 ADVICE)
    ('HTTPS://X.com?ID=3', 'https://x.com?ID=3', 'x.com', 'x.com'),
    ('https://x.com:443?id=3', 'https://x.com?id=3', 'x.com',
     'x.com'),
    ('HTTP://Y.org:80?Q=Vv#f', 'http://y.org?Q=Vv', 'y.org',
     'y.org'),
    # fragment with no path
    ('HTTPS://Z.net#sec', 'https://z.net', 'z.net', 'z.net'),
    # tracking param with no path
    ('https://x.com?utm_source=f&id=3', 'https://x.com?id=3',
     'x.com', 'x.com'),
]


@pytest.mark.parametrize('url,canon,host,domain', CASES)
def test_url_rules(spark_session, url, canon, host, domain):
    got = _canon(spark_session, [url])[0]
    assert got == (canon, host, domain)


def test_url_dedup_keeps_earliest(spark_session):
    df = spark_session.createDataFrame(
        [(1, 'https://X.com/p?utm_source=a'),
         (2, 'HTTPS://x.COM:443/p'),
         (3, 'https://x.com/p#f'),
         (4, 'https://x.com/q')],
        'doc_id long, url string')
    out = {r['canonical_url']: (r['doc_id'], r['n_dups'])
           for r in web.url_dedup(df, 'url', 'doc_id').collect()}
    assert out == {'https://x.com/p': (1, 3),
                   'https://x.com/q': (4, 1)}


def _domains(spark, urls, suffixes):
    df = spark.createDataFrame([(u,) for u in urls], 'url string')
    out = web.with_registrable_domain(df, 'url', suffixes=suffixes)
    return [r['domain'] for r in out.collect()]


PSL = ['com', 'org', 'uk', 'co.uk', 'com.cn', 'co.kr',
       'github.io', 'pref.aichi.jp', 'jp']


def test_psl_registrable_domain_longest_match(spark_session):
    got = _domains(spark_session, [
        'https://www.example.com/p',          # 1-label suffix
        'https://news.bbc.co.uk/story',       # 2-label suffix
        'https://shop.foo.com.cn/',           # 2-label (heuristic
                                              # doesn't know com.cn)
        'https://a.b.pref.aichi.jp/x',        # 3-label suffix
        'https://user.github.io/repo',        # private suffix
        'https://deep.sub.user.github.io/',   # label just above it
    ], PSL)
    assert got == ['example.com', 'bbc.co.uk', 'foo.com.cn',
                   'b.pref.aichi.jp', 'user.github.io',
                   'user.github.io']


def test_psl_host_that_is_a_suffix_has_no_domain(spark_session):
    got = _domains(spark_session, [
        'https://co.uk/',        # host IS a public suffix
        'https://github.io/x',   # private suffix as bare host
    ], PSL)
    assert got == ['', '']


def test_psl_unmatched_host_falls_back_to_last_two_labels(
        spark_session):
    got = _domains(spark_session, [
        'https://foo.bar.internal/x',   # no rule -> '*' default
        'http://localhost:8080/x',      # single label -> no eTLD+1
    ], PSL)
    assert got == ['bar.internal', '']


def test_psl_default_path_matches_heuristic(spark_session):
    urls = [c[0] for c in CASES]
    df = spark_session.createDataFrame([(u,) for u in urls],
                                       'url string')
    a = web.with_registrable_domain(df, 'url').collect()
    b = df.select('url', web.registrable_domain('url')
                  .alias('domain')).collect()
    assert [r['domain'] for r in a] == [r['domain'] for r in b]


class TestBundledPslSnapshot:
    """The bundled fixture-scale PSL snapshot + loader."""

    def test_loader_parses_snapshot(self):
        sfx = web.load_public_suffixes()
        # plain rules land, comments/blank lines don't
        assert {'com', 'co.uk', 'com.cn', 'co.jp',
                'github.io', 's3.amazonaws.com'} <= sfx
        # wildcard and exception rules are skipped by contract
        assert not any(s.startswith(('*', '!')) for s in sfx)
        assert 'ck' not in sfx          # only *.ck / !www.ck listed
        assert '' not in sfx
        # fixture-scale, never corpus-scale
        assert 100 < len(sfx) < 1000

    def test_loader_reads_explicit_path(self, tmp_path):
        p = tmp_path / 'psl.dat'
        p.write_text('// c\n\nfoo\nbar.baz  // trailing\n*.w\n!e.w\n')
        assert web.load_public_suffixes(str(p)) \
            == frozenset({'foo', 'bar.baz'})

    def test_snapshot_drives_exact_matching(self, spark_session):
        got = _domains(spark_session, [
            'https://news.bbc.co.uk/story',     # ICANN 2-label
            'https://user.github.io/repo',      # private suffix
            'https://shop.example.com.cn/',     # 2-label ccTLD
            'https://x.y.example.de/',          # 1-label ccTLD
            'https://foo.something.ck/',        # wildcard skipped ->
                                                # '*' default rule
        ], web.load_public_suffixes())
        assert got == ['bbc.co.uk', 'user.github.io',
                       'example.com.cn', 'example.de',
                       'something.ck']


def test_psl_rejects_overlong_suffix(spark_session):
    df = spark_session.createDataFrame([('https://x.com/',)],
                                       'url string')
    with pytest.raises(ValueError, match='max_suffix_labels'):
        web.with_registrable_domain(
            df, 'url', suffixes=['a.b.c.d.e.f'])


def test_psl_path_is_shuffle_free(spark_session):
    """The PSL lookup must stay a chain of BROADCAST joins — no
    Exchange, no Python UDF — so at corpus scale it is map-side
    only."""
    df = spark_session.range(100).select(
        F.concat(F.lit('https://h'), F.col('id'),
                 F.lit('.co.uk/p')).alias('url'))
    out = web.with_registrable_domain(df, 'url', suffixes=PSL)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan.replace('BroadcastExchange', ''), \
        plan
    assert 'BatchEvalPython' not in plan
    assert 'ArrowEvalPython' not in plan
    assert 'BroadcastHashJoin' in plan


def test_canonicalization_is_pure_codegen(spark_session):
    """No UDF, no shuffle: the whole canonical projection must stay
    inside one WholeStageCodegen over the scan."""
    df = spark_session.range(100).select(
        F.concat(F.lit('https://h'), F.col('id'),
                 F.lit('.com/p?utm_x=1&id='), F.col('id'))
        .alias('url'))
    out = df.select(web.canonicalize_url('url').alias('c'),
                    web.registrable_domain('url').alias('d'))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan
    assert 'BatchEvalPython' not in plan
    assert 'ArrowEvalPython' not in plan


def test_extract_links_order_and_contract(spark_session):
    # document order preserved across quoting styles and attribute
    # case; values may contain the OTHER quote character
    html = ('<html><a href="https://a.com/1">x</a> text '
            '<img src="i.png"/><A HREF="https://c.net/up">case</A>'
            '<a class="c" href="http://b.org/p?q=1#f">y</a>'
            '<a href=\'https://sq.io/it"s\'></a></html>')
    df = spark_session.createDataFrame([(html,), (None,), ('',)],
                                       'html string')
    rows = df.select(web.extract_links('html').alias('l')).collect()
    assert rows[0]['l'] == [
        'https://a.com/1', 'https://c.net/up',
        'http://b.org/p?q=1#f', 'https://sq.io/it"s']
    assert rows[1]['l'] is None
    assert rows[2]['l'] == []


def test_outlink_domain_edges_counts_and_canonicalizes(spark_session):
    pages = spark_session.createDataFrame([
        ('https://www.x.com/',
         '<a href="HTTP://A.com:80/p?utm_source=z#t">1</a>'
         '<a href="https://sub.a.com/q">2</a>'
         '<a href="https://b.co.uk/r">3</a>'),
        ('https://x.com/2', '<a href="https://a.com/other">4</a>'),
        ('https://y.org/', 'no links here'),
    ], 'url string, html string')
    edges = {(r['src_domain'], r['dst_domain']): r['n_links']
             for r in web.outlink_domain_edges(
                 pages, 'url', 'html').collect()}
    # both x.com pages' a.com links merge: (www.)x.com -> (sub.)a.com
    assert edges == {('x.com', 'a.com'): 3, ('x.com', 'b.co.uk'): 1}


def test_outlink_edges_single_shuffle(spark_session):
    pages = spark_session.createDataFrame(
        [('https://x.com/', '<a href="https://a.com/">l</a>')],
        'url string, html string')
    plan = web.outlink_domain_edges(
        pages, 'url', 'html')._jdf.queryExecution().executedPlan().toString()
    assert plan.count('Exchange') == 1


MAGIC_CASES = [
    (b'%PDF-1.7\nrest', 'application/pdf'),
    (b'\xff\xd8\xff\xe0JFIF', 'image/jpeg'),
    (b'\x89PNG\r\n\x1a\nchunk', 'image/png'),
    (b'GIF89a;;;', 'image/gif'),
    (b'RIFF\x00\x00\x00\x00WEBPVP8 ', 'image/webp'),
    (b'RIFF\x00\x00\x00\x00WAVEfmt ', 'audio/wav'),
    (b'RIFF\x00\x00\x00\x00AVI LIST', 'video/x-msvideo'),
    (b'\x00\x00\x00\x18ftypisom', 'video/mp4'),
    (b'OggS\x00\x02', 'application/ogg'),
    (b'fLaC\x00\x00\x00"', 'audio/flac'),
    (b'ID3\x04\x00', 'audio/mpeg'),
    (b'\x1f\x8b\x08\x00', 'application/gzip'),
    (b'PK\x03\x04\x14\x00', 'application/zip'),
    (b'<!DOCTYPE html><html>', 'text/html'),
    (b'<HTML><body>', 'text/html'),
    (b'<?xml version="1.0"?>', 'application/xml'),
    (b'plain words only here', 'text/plain'),
    (b'tab\tand\r\nnewlines ok', 'text/plain'),
    (b'\x00\x01\x02\x03 binary', 'application/octet-stream'),
    (None, None),
    # Multi-byte UTF-8 straddling the 32-byte sniff window: the
    # truncated tail must be trimmed, not decoded to U+FFFD.
    b'x' + ('é' * 20).encode('utf-8'),          # C3 lead at byte 32
    ('日本語テキスト日本語テキ').encode('utf-8'),  # E3 xx cut at 32
    b'a' + ('𝄞' * 8).encode('utf-8') + b'!',     # F0 9D 84 cut at 32
    ('中文' * 30).encode('utf-8'),                # E4 xx cut, >32B
    # Genuinely invalid UTF-8 inside the window still quarantines.
    (b'ok text \xc3\x28 broken continuation',
     'application/octet-stream'),
]
# the straddle rows above are (bytes,) shorthand for text/plain
MAGIC_CASES = [c if isinstance(c, tuple) else (c, 'text/plain')
               for c in MAGIC_CASES]


def test_sniff_mime_magic_bytes(spark_session):
    df = spark_session.createDataFrame(
        [(i, bytearray(b) if b is not None else None)
         for i, (b, _) in enumerate(MAGIC_CASES)],
        'i int, payload binary')
    got = {r['i']: r['mime'] for r in df.select(
        'i', web.sniff_mime('payload').alias('mime')).collect()}
    for i, (b, want) in enumerate(MAGIC_CASES):
        assert got[i] == want, (b, got[i], want)


def test_sniff_mime_is_pure_codegen(spark_session):
    df = spark_session.createDataFrame(
        [(bytearray(b'x'),)], 'payload binary')
    plan = df.select(
        web.sniff_mime('payload').alias('m'))._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in plan


def test_extract_anchors_pairs(spark_session):
    html = ('<a href="https://a.com/1">first</a>'
            '<a id="k" href="https://b.com/2" rel="x">second</a>'
            '<a href="https://c.com/3"><b>nested ends capture</b></a>'
            '<a href="https://d.com/4"></a>')
    df = spark_session.createDataFrame([(html,)], 'html string')
    pairs = df.select(
        web.extract_anchors('html').alias('a')).first()['a']
    assert [(p['url'], p['text']) for p in pairs] == [
        ('https://a.com/1', 'first'),
        ('https://b.com/2', 'second'),
        ('https://d.com/4', ''),
    ]


def test_extract_anchors_quote_and_order_insensitive(spark_session):
    # single-quoted hrefs, href-last attribute order, uppercase
    # tags — all must extract; an anchor with NO href is skipped
    html = ("<a href='https://s.io/1'>sq</a>"
            '<A CLASS="r" HREF="https://u.io/2">up</A>'
            "<a rel='x' href='https://o.io/3' id='z'>mid</a>"
            '<a name="no-href">skip</a>')
    df = spark_session.createDataFrame([(html,)], 'html string')
    pairs = df.select(
        web.extract_anchors('html').alias('a')).first()['a']
    assert [(p['url'], p['text']) for p in pairs] == [
        ('https://s.io/1', 'sq'),
        ('https://u.io/2', 'up'),
        ('https://o.io/3', 'mid'),
    ]


def test_anchor_texts_aggregates_per_canonical_target(spark_session):
    pages = spark_session.createDataFrame([
        ('<a href="HTTPS://T.com:443/p?utm_source=z">buy</a>',),
        ('<a href="https://t.com/p">buy</a> '
         '<a href="https://t.com/p">cheap</a>',),
    ], 'html string')
    rows = {r['target_url']: r for r in
            web.anchor_texts(pages, 'html').collect()}
    assert rows['https://t.com/p']['n_anchors'] == 3
    assert rows['https://t.com/p']['texts'] == ['buy', 'cheap']


def test_crawl_diff_statuses(spark_session):
    old = spark_session.createDataFrame([
        ('u1', 'h1'), ('u2', 'h2'), ('u3', 'h3'), ('u4', None),
    ], 'url string, fingerprint string')
    new = spark_session.createDataFrame([
        ('u1', 'h1'), ('u2', 'h2b'), ('u4', None), ('u5', 'h5'),
    ], 'url string, fingerprint string')
    got = {r['url']: r['status'] for r in
           web.crawl_diff(old, new).collect()}
    assert got == {
        'u1': 'unchanged',
        'u2': 'changed',
        'u3': 'removed',
        'u4': 'unchanged',  # NULL fingerprints compare null-safely
        'u5': 'added',
    }


class TestParseSitemap:
    XML = (
        '<?xml version="1.0"?>\n<urlset>\n'
        '<url>\n  <loc> https://a.com/1 </loc>\n'
        '  <lastmod>2026-01-02</lastmod>\n'
        '  <changefreq>daily</changefreq>\n'
        '  <priority>0.8</priority>\n</url>\n'
        '<url><loc>https://a.com/2</loc></url>\n'
        '</urlset>')
    IDX = ('<sitemapindex><sitemap>'
           '<loc>https://a.com/s1.xml</loc>'
           '<lastmod>2026-02-01</lastmod>'
           '</sitemap></sitemapindex>')

    def _parse(self, spark, xml):
        df = spark.createDataFrame(
            [('https://a.com/sitemap.xml', xml)],
            'sitemap_url string, xml string')
        return web.parse_sitemap(df).collect()

    def test_urlset_fields_and_order(self, spark_session):
        rows = sorted(self._parse(spark_session, self.XML),
                      key=lambda r: r['pos'])
        assert [(r['kind'], r['pos'], r['loc'], r['lastmod'],
                 r['changefreq'], r['priority']) for r in rows] == [
            ('urlset', 0, 'https://a.com/1', '2026-01-02',
             'daily', 0.8),
            ('urlset', 1, 'https://a.com/2', None, None, None),
        ]

    def test_sitemapindex_blocks(self, spark_session):
        rows = self._parse(spark_session, self.IDX)
        assert [(r['kind'], r['loc'], r['lastmod'])
                for r in rows] == [
            ('sitemapindex', 'https://a.com/s1.xml', '2026-02-01')]

    def test_pure_codegen(self, spark_session):
        df = spark_session.createDataFrame(
            [('u', self.XML)], 'sitemap_url string, xml string')
        plan = web.parse_sitemap(df)._jdf \
            .queryExecution().executedPlan().toString()
        assert 'Python' not in plan


class TestExtractHtmlMeta:
    def _meta(self, spark, html):
        df = spark.createDataFrame([(html,)], 'html string')
        return df.select(
            web.extract_html_meta('html').alias('m')).first()['m']

    def test_all_fields(self, spark_session):
        m = self._meta(
            spark_session,
            '<!DOCTYPE html><HTML lang="fr"><head>'
            '<TITLE>  Le Titre  </TITLE>'
            '<meta name="description" content="une page">'
            '<link rel="canonical" href="https://a.com/x">'
            '</head><body>hi</body></html>')
        assert (m['title'], m['description'],
                m['canonical_url'], m['lang']) == (
            'Le Titre', 'une page', 'https://a.com/x', 'fr')

    def test_absent_fields_are_null(self, spark_session):
        m = self._meta(spark_session,
                       '<html><head><title>t</title></head></html>')
        assert (m['title'], m['description'],
                m['canonical_url'], m['lang']) == (
            't', None, None, None)

    def test_attribute_order_and_quoting_insensitive(
            self, spark_session):
        # content-before-name, single quotes, lang not the first
        # html attribute — the real-world forms the old fixed-order
        # double-quote regexes silently dropped
        m = self._meta(
            spark_session,
            "<html data-theme='d' lang='pt'><head>"
            '<title>t</title>'
            "<meta content='uma pagina' name='description'>"
            "<link href='https://a.com/y' rel='canonical'>"
            '</head></html>')
        assert (m['title'], m['description'],
                m['canonical_url'], m['lang']) == (
            't', 'uma pagina', 'https://a.com/y', 'pt')

    def test_wrong_name_or_rel_stays_null(self, spark_session):
        # meta/link tags with other name/rel values must not leak
        # into the struct even though they carry content/href
        m = self._meta(
            spark_session,
            '<html><head>'
            '<meta name="keywords" content="nope">'
            '<link rel="stylesheet" href="/s.css">'
            '<meta name="description" content="yes">'
            '</head></html>')
        assert (m['description'], m['canonical_url']) == (
            'yes', None)

    def test_first_matching_tag_wins(self, spark_session):
        m = self._meta(
            spark_session,
            '<html><head>'
            '<meta name="description" content="first">'
            '<meta name="description" content="second">'
            '</head></html>')
        assert m['description'] == 'first'

    def test_pure_codegen(self, spark_session):
        df = spark_session.createDataFrame([('<html/>',)],
                                           'html string')
        plan = df.select(web.extract_html_meta('html'))._jdf \
            .queryExecution().executedPlan().toString()
        assert 'Python' not in plan


class TestCrawlFrontier:
    def _frontier(self, spark, **kw):
        rows = [(f'https://h{i % 2}.com/p{i}', f'h{i % 2}.com', i % 3)
                for i in range(10)]
        df = spark.createDataFrame(
            rows, 'url string, host string, priority long')
        return web.crawl_frontier(df, 'url', 'host', 'priority',
                                  **kw)

    def test_slots_rank_within_host(self, spark_session):
        out = self._frontier(spark_session,
                             per_host_per_wave=2).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r['host'], []).append(r)
        for host, rows in by_host.items():
            rows.sort(key=lambda r: r['slot'])
            # slots dense 1..n per host
            assert [r['slot'] for r in rows] == list(
                range(1, len(rows) + 1))
            # priority non-increasing down the slots
            prios = [r['url'] for r in rows]
            assert rows == sorted(
                rows, key=lambda r: (-int(r['url'][-1]) % 3
                                     if False else r['slot']))
            # wave = (slot-1) // per_wave
            assert all(r['wave'] == (r['slot'] - 1) // 2
                       for r in rows)

    def test_priority_order_and_tiebreak(self, spark_session):
        df = spark_session.createDataFrame(
            [('u/b', 'h', 5), ('u/a', 'h', 5), ('u/c', 'h', 9)],
            'url string, host string, priority long')
        out = sorted(web.crawl_frontier(df, 'url', 'host',
                                        'priority').collect(),
                     key=lambda r: r['slot'])
        assert [r['url'] for r in out] == ['u/c', 'u/a', 'u/b']

    def test_max_per_host_caps(self, spark_session):
        out = self._frontier(spark_session, per_host_per_wave=2,
                             max_per_host=3).collect()
        assert len(out) == 6          # 3 kept per host
        assert all(r['slot'] <= 3 for r in out)


def test_zipf_slope_exact_small_corpus(spark_session):
    import math

    from ons_utils_spark.operators.text import zipf_slope
    # freq(a)=4, freq(b)=2, freq(c)=1 -> perfect Zipf-ish line:
    # ln(freq) vs ln(rank) through (0, ln4), (ln2, ln2), (ln3, 0)
    df = spark_session.createDataFrame(
        [('a a a a b',), ('b c',)], 'text string')
    row = zipf_slope(df, 'text', top_k=10).first()
    assert row['n_types'] == 3
    x = [math.log(1), math.log(2), math.log(3)]
    y = [math.log(4), math.log(2), math.log(1)]
    mx, my = sum(x) / 3, sum(y) / 3
    slope = (sum((a - mx) * (b - my) for a, b in zip(x, y))
             / sum((a - mx) ** 2 for a in x))
    assert abs(row['slope'] - round(slope, 6)) < 1e-6
    assert row['freq_rank_corr'] < -0.95   # monotone decreasing


def test_zipf_slope_no_global_sort(spark_session):
    from ons_utils_spark.operators.text import zipf_slope
    df = spark_session.createDataFrame(
        [('w%d x y' % i,) for i in range(50)], 'text string')
    plan = zipf_slope(df, 'text', top_k=5)._jdf \
        .queryExecution().executedPlan().toString()
    # top-k must plan as TakeOrdered, not a global Sort of the vocab
    assert 'TakeOrderedAndProject' in plan


class TestExtractHreflang:
    def test_pairs_in_order_decoys_ignored(self, spark_session):
        html = ('<html><head>'
                '<link rel="canonical" href="https://x.com/c">'
                '<link rel="alternate" hreflang="de" '
                'href="https://x.com/de">'
                '<link rel="stylesheet" href="/s.css">'
                '<link rel="alternate" hreflang="fr" '
                'href="https://x.com/fr">'
                '</head></html>')
        df = spark_session.createDataFrame([(html,)], 'html string')
        out = df.select(
            web.extract_hreflang('html').alias('a')).first()['a']
        assert [(r['lang'], r['href']) for r in out] == [
            ('de', 'https://x.com/de'), ('fr', 'https://x.com/fr')]

    def test_order_quote_insensitive_and_feed_decoy(
            self, spark_session):
        # swapped attribute order + single quotes must extract; an
        # hreflang-less rel="alternate" (RSS feed link) must NOT
        html = ('<html><head>'
                "<link hreflang='es' href='https://x.com/es' "
                'rel="alternate">'
                '<link rel="alternate" type="application/rss+xml" '
                'href="/feed.xml">'
                '<link href="https://x.com/en" rel="alternate" '
                'hreflang="en">'
                '</head></html>')
        df = spark_session.createDataFrame([(html,)], 'html string')
        out = df.select(
            web.extract_hreflang('html').alias('a')).first()['a']
        assert [(r['lang'], r['href']) for r in out] == [
            ('es', 'https://x.com/es'), ('en', 'https://x.com/en')]

    def test_pure_codegen(self, spark_session):
        df = spark_session.createDataFrame([('<html/>',)],
                                           'html string')
        plan = df.select(web.extract_hreflang('html'))._jdf \
            .queryExecution().executedPlan().toString()
        assert 'Python' not in plan


class TestFetchSchedule:
    def test_timeline_and_unknown_host_null(self, spark_session):
        frontier = spark_session.createDataFrame(
            [('u1', 'a.com', 1, 0), ('u2', 'a.com', 2, 0),
             ('u3', 'a.com', 3, 0), ('u4', 'b.com', 1, 0),
             ('u5', 'nodelay.com', 2, 0)],
            'url string, host string, slot int, wave int')
        delays = spark_session.createDataFrame(
            [('a.com', 2.5), ('b.com', 1.0)],
            'host string, crawl_delay double')
        out = {r['url']: r['fetch_at_sec'] for r in
               web.fetch_schedule(frontier, delays).collect()}
        assert out == {'u1': 0.0, 'u2': 2.5, 'u3': 5.0,
                       'u4': 0.0, 'u5': None}

    def test_delay_table_broadcasts(self, spark_session):
        frontier = spark_session.createDataFrame(
            [('u', 'a.com', 1, 0)],
            'url string, host string, slot int, wave int')
        delays = spark_session.createDataFrame(
            [('a.com', 1.0)], 'host string, crawl_delay double')
        plan = web.fetch_schedule(frontier, delays)._jdf \
            .queryExecution().executedPlan().toString()
        assert 'BroadcastHashJoin' in plan


class TestQualityBlocklist:
    def _df(self, spark_session):
        rows = ([('good.com', True)] * 9 + [('good.com', False)]
                + [('bad.com', True)] * 2 + [('bad.com', False)] * 2
                + [('tiny.com', False)])
        return spark_session.createDataFrame(
            rows, 'domain string, quality_pass boolean')

    def test_census_and_threshold(self, spark_session):
        from ons_utils_spark.operators.web import quality_blocklist
        got = {r['domain']: (r['n_docs'], r['n_fail'], r['blocked'])
               for r in quality_blocklist(
                   self._df(spark_session), min_docs=3,
                   max_fail_num=1, max_fail_den=4).collect()}
        # 1/10 fails <= 1/4 -> kept; 2/4 > 1/4 -> blocked;
        # tiny.com fails 100% but is under the evidence floor
        assert got == {'good.com': (10, 1, False),
                       'bad.com': (4, 2, True),
                       'tiny.com': (1, 1, False)}

    def test_exact_boundary_not_blocked(self, spark_session):
        from ons_utils_spark.operators.web import quality_blocklist
        rows = [('edge.com', True)] * 3 + [('edge.com', False)]
        df = spark_session.createDataFrame(
            rows, 'domain string, quality_pass boolean')
        r = quality_blocklist(df, min_docs=2).collect()[0]
        # exactly 1/4 does NOT exceed 1/4
        assert not r['blocked']

    def test_validation(self, spark_session):
        from ons_utils_spark.operators.web import quality_blocklist
        df = self._df(spark_session)
        with pytest.raises(ValueError, match='min_docs'):
            quality_blocklist(df, min_docs=0)
        with pytest.raises(ValueError, match='ratio'):
            quality_blocklist(df, max_fail_den=0)
