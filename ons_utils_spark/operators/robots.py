"""robots.txt crawl filtering: parse per-host rule files, decide
fetchability per URL (RFC 9309 longest-match semantics).

Extension (no reference counterpart) — between URL canonicalization
(``operators.web``) and the crawl front door
(``streaming.incremental``) sits the politeness gate: a crawl keeps
one robots.txt per host and every candidate URL is checked against
the host's Allow/Disallow rules before fetch.

Spark-first shape, no UDFs anywhere:

- :func:`parse_robots` turns ``(host, robots_txt)`` rows into a flat
  rule table ``(host, rule, prefix)`` with ``split`` + ``posexplode``
  + two windows over ``(host, line_pos)`` — group blocks are
  recovered by a cumulative sum over ``User-agent`` line starts, and
  agent selection (specific agent beats ``*`` beats nothing) is one
  per-host ``max``.  robots files are KiB-sized and one-per-host, so
  these windows partition on host and never see corpus-scale rows.
- :func:`crawl_allowed` joins candidate URLs to the rule table on
  host and keeps the LONGEST matching rule per URL (``max`` of a
  ``(length, is_allow)`` struct — allow wins length ties, RFC 9309
  §2.2.2), defaulting to allowed when no rule matches.  The rule
  table is broadcast (hosts × rules is tiny next to the URL corpus),
  so at 100 TB this is a map-side join + one aggregate keyed by the
  URL — the same shuffle any per-URL verdict needs.

Wildcard rules (RFC 9309 §2.2.3 MUSTs): ``*`` matches any character
run and a trailing ``$`` anchors the end of the path.  Each
wildcard-bearing rule is rendered ONCE, on the tiny rule table
before the broadcast, into an anchored regex (metacharacters
escaped, ``*`` → ``.*``) evaluated with ``regexp_like``; plain
rules keep the cheaper ``startswith`` path.  Specificity stays the
raw rule's octet length for both kinds — the same most-octets order
the googlebot matcher uses.  Matching uses the URL's path only
(query strings excluded), with the empty path treated as ``/``.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from .web import url_host

__all__ = ['parse_robots', 'crawl_allowed', 'url_path',
           'robots_sitemaps', 'crawl_delays']


def url_path(url) -> Column:
    """The path component of ``url`` ('' query/fragment excluded;
    empty path → ``/``)."""
    u = F.col(url) if isinstance(url, str) else url
    p = F.regexp_extract(u, '^[^/]*//[^/?#]+([^?#]*)', 1)
    return F.when(p == '', F.lit('/')).otherwise(p)


def parse_robots(
    df: SparkDF,
    host_col: str = 'host',
    txt_col: str = 'robots_txt',
    user_agent: str = '*',
) -> SparkDF:
    """Flatten robots.txt files into ``(host, rule, prefix)`` rows —
    ``rule`` in ``('allow', 'disallow')`` — keeping only the group
    that applies to ``user_agent``.

    Group recovery per RFC 9309 §2.2.1: a group starts at a
    ``User-agent`` line not directly preceded by another (stacked
    agent lines share one group); rules before any group are
    ignored.  Agent selection: groups naming ``user_agent`` exactly
    (case-insensitive) win over ``*`` groups; with neither, the host
    has no rules (everything allowed).  Empty-value rules are
    dropped (``Disallow:`` with no path allows everything — RFC
    §2.2.2), as are comment and unknown-directive lines.
    """
    host = F.col(host_col)
    lines = df.select(
        host.alias('host'),
        F.posexplode(F.split(F.col(txt_col), '\n'))
        .alias('line_pos', 'raw'))
    # comments off, then 'Directive: value'
    clean = F.trim(F.regexp_replace(F.col('raw'), '#.*$', ''))
    directive = F.lower(F.regexp_extract(clean, r'^([A-Za-z-]+)\s*:', 1))
    value = F.trim(F.regexp_extract(clean, r'^[A-Za-z-]+\s*:(.*)$', 1))
    lines = lines.select(
        'host', 'line_pos',
        directive.alias('directive'), value.alias('value'))
    is_ua = F.col('directive') == 'user-agent'
    w = (Window.partitionBy('host').orderBy('line_pos')
         .rowsBetween(Window.unboundedPreceding, 0))
    prev_ua = F.lag(is_ua).over(
        Window.partitionBy('host').orderBy('line_pos'))
    group_start = is_ua & ~F.coalesce(prev_ua, F.lit(False))
    lines = lines.withColumn(
        'group_id', F.sum(group_start.cast('int')).over(w))
    # per group: does it name our agent (2), '*' (1), or neither (0)?
    agent_rank = F.max(
        F.when(is_ua & (F.lower(F.col('value'))
                        == user_agent.lower()), 2)
        .when(is_ua & (F.col('value') == '*'), 1)
        .otherwise(0)
    ).over(Window.partitionBy('host', 'group_id'))
    best_rank = F.max(agent_rank).over(Window.partitionBy('host'))
    return (
        lines
        .withColumn('agent_rank', agent_rank)
        .withColumn('best_rank', best_rank)
        .where((F.col('group_id') > 0)
               & (F.col('agent_rank') == F.col('best_rank'))
               & (F.col('agent_rank') > 0)
               & F.col('directive').isin('allow', 'disallow')
               & (F.col('value') != ''))
        .select('host', F.col('directive').alias('rule'),
                F.col('value').alias('prefix'))
    )


def crawl_allowed(
    urls: SparkDF,
    url_col: str,
    rules: SparkDF,
    out_col: str = 'allowed',
) -> SparkDF:
    """Per DISTINCT URL in ``urls``, a boolean ``out_col``: may this
    URL be fetched under ``rules`` (the :func:`parse_robots`
    output)?  Join the verdict table back to keep full rows.

    Longest-match per RFC 9309 §2.2.2 — the most specific matching
    rule decides (most octets of the raw rule, wildcards counted as
    written), allow winning exact-length ties; a URL whose host has
    no matching rule is allowed.  ``*`` / ``$`` wildcard rules
    (§2.2.3) are rendered into anchored regexes on the rule table
    BEFORE the broadcast — per-rule regex cost is bounded by the
    tiny rule count, and plain rules keep the ``startswith`` fast
    path.  One broadcast join on host + one aggregate keyed by the
    URL.
    """
    raw = F.col('prefix')
    ends_anchor = raw.endswith('$')
    body = F.when(
        ends_anchor, raw.substr(F.lit(1), F.length(raw) - 1)
    ).otherwise(raw)
    # escape every regex metachar except '*' (the robots wildcard);
    # a mid-rule '$' is a literal octet per the RFC, so it is
    # escaped too (only the trailing '$', already stripped, anchors)
    escaped = F.regexp_replace(
        body, r'([\\.\[\]\{\}\(\)\^\$\|\+\?])', r'\\$1')
    regex = F.concat(
        F.lit('^'), F.regexp_replace(escaped, r'\*', '.*'),
        F.when(ends_anchor, F.lit('$')).otherwise(F.lit('')))
    prepped = rules.withColumnRenamed('host', '__host').withColumns({
        '__wild': raw.contains('*') | ends_anchor,
        '__re': regex,
    })
    with_key = urls.select(
        F.col(url_col).alias('__url'),
        url_host(url_col).alias('__host'),
        url_path(url_col).alias('__path'))
    joined = with_key.join(F.broadcast(prepped), ['__host'], 'left')
    match = F.col('prefix').isNotNull() & F.when(
        F.col('__wild'),
        F.regexp_like(F.col('__path'), F.col('__re'))
    ).otherwise(F.col('__path').startswith(F.col('prefix')))
    verdict = F.when(
        match,
        F.struct(F.length('prefix').alias('l'),
                 (F.col('rule') == 'allow').cast('int').alias('a')))
    return (
        joined.groupBy('__url')
        .agg(F.max(verdict).alias('__win'))
        .select(
            F.col('__url').alias(url_col),
            F.coalesce(F.col('__win.a') == 1, F.lit(True))
            .alias(out_col))
    )


def robots_sitemaps(
    df: SparkDF,
    host_col: str = 'host',
    txt_col: str = 'robots_txt',
) -> SparkDF:
    """``(host, sitemap_url)`` rows from ``Sitemap:`` lines —
    sitemap DISCOVERY, the usual crawl entry point (RFC 9309 §2.3 /
    the sitemaps.org protocol: the directive is group-INDEPENDENT,
    so unlike Allow/Disallow it is read from anywhere in the file,
    before any ``User-agent`` line included).

    One ``posexplode`` + codegen extracts, same KiB-per-host scale
    argument as :func:`parse_robots`; feed the result to
    ``web.parse_sitemap`` after fetching.
    """
    host = F.col(host_col)
    lines = df.select(
        host.alias('host'),
        F.posexplode(F.split(F.col(txt_col), '\n'))
        .alias('line_pos', 'raw'))
    clean = F.trim(F.regexp_replace(F.col('raw'), '#.*$', ''))
    url = F.trim(F.regexp_extract(
        clean, r'^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\s*:(.*)$', 1))
    return (
        lines.select('host', 'line_pos', url.alias('sitemap_url'))
        .where(F.col('sitemap_url') != '')
    )


def crawl_delays(
    df: SparkDF,
    host_col: str = 'host',
    txt_col: str = 'robots_txt',
    user_agent: str = '*',
    default_delay: float = 1.0,
) -> SparkDF:
    """``(host, crawl_delay)`` — the ``Crawl-delay`` (seconds, may
    be fractional) of the group :func:`parse_robots` would select
    for ``user_agent``, defaulting to ``default_delay`` for hosts
    whose selected group has none.  Feed it to the frontier
    scheduler: ``web.crawl_frontier``'s waves spaced
    ``crawl_delay × per_host_per_wave`` apart give the fetch
    timeline each host's policy asks for.

    Same group-recovery windows as :func:`parse_robots` (KiB-scale
    per host), one extra per-host ``min`` (the most conservative
    delay wins when a group repeats the directive).
    """
    host = F.col(host_col)
    lines = df.select(
        host.alias('host'),
        F.posexplode(F.split(F.col(txt_col), '\n'))
        .alias('line_pos', 'raw'))
    clean = F.trim(F.regexp_replace(F.col('raw'), '#.*$', ''))
    directive = F.lower(
        F.regexp_extract(clean, r'^([A-Za-z-]+)\s*:', 1))
    value = F.trim(
        F.regexp_extract(clean, r'^[A-Za-z-]+\s*:(.*)$', 1))
    lines = lines.select(
        'host', 'line_pos',
        directive.alias('directive'), value.alias('value'))
    is_ua = F.col('directive') == 'user-agent'
    w = (Window.partitionBy('host').orderBy('line_pos')
         .rowsBetween(Window.unboundedPreceding, 0))
    prev_ua = F.lag(is_ua).over(
        Window.partitionBy('host').orderBy('line_pos'))
    group_start = is_ua & ~F.coalesce(prev_ua, F.lit(False))
    lines = lines.withColumn(
        'group_id', F.sum(group_start.cast('int')).over(w))
    agent_rank = F.max(
        F.when(is_ua & (F.lower(F.col('value'))
                        == user_agent.lower()), 2)
        .when(is_ua & (F.col('value') == '*'), 1)
        .otherwise(0)
    ).over(Window.partitionBy('host', 'group_id'))
    best_rank = F.max(agent_rank).over(Window.partitionBy('host'))
    delays = (
        lines
        .withColumn('agent_rank', agent_rank)
        .withColumn('best_rank', best_rank)
        .where((F.col('group_id') > 0)
               & (F.col('agent_rank') == F.col('best_rank'))
               & (F.col('agent_rank') > 0)
               & (F.col('directive') == 'crawl-delay')
               & F.col('value').rlike(r'^\d+(\.\d+)?$'))
        .groupBy('host')
        .agg(F.min(F.col('value').cast('double'))
             .alias('crawl_delay')))
    hosts = df.select(host.alias('host')).distinct()
    return (hosts.join(delays, 'host', 'left')
            .select('host',
                    F.coalesce('crawl_delay', F.lit(default_delay))
                    .alias('crawl_delay')))
