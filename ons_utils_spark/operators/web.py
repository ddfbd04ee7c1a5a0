"""Web-ingest URL operators: canonicalization, host/domain
extraction, exact URL dedup.

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
``co.uk``) — the full Public Suffix List is an external artifact by
declared scope; the known-suffix set covers the common cases and is
easy to extend.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ['canonicalize_url', 'url_host', 'registrable_domain',
           'url_dedup', 'TRACKING_PARAM_RE', 'TWO_LABEL_SUFFIXES']

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
