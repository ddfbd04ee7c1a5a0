"""Text-analysis operators for large-scale document pipelines.

North-star extension (not in the reference — SURVEY.md §2.2 lists no
string functions): language-ID, quality scoring, token counting,
fingerprinting over the ``documents`` table. Everything is built from
native ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) — no
Python UDFs anywhere, so these run at parquet-scan speed on 100 TB.
(Single documented exception: :func:`compression_ratio`, whose
DEFLATE pass has no JVM-builtin equivalent and runs as an
Arrow-batched pandas UDF.)
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

import pandas as pd

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..functions.columns import convert_to_spark_col

ColumnOrName = Union[str, SparkCol]

# Tiny built-in stopword list for quality scoring (language-agnostic
# English core; callers pass their own for other languages).
DEFAULT_STOPWORDS = (
    'the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it',
    'that', 'for', 'on', 'with', 'as', 'at', 'by', 'be',
)

# Character-frequency profiles for the n-gram language-ID heuristic:
# distinctive character classes per language. Deliberately simple and
# deterministic — a placeholder for a real fastText-style model, with
# the Spark plumbing (scoring expression, argmax) production-shaped.
_LANG_MARKERS: Mapping[str, str] = {
    'en': r'\b(the|and|of|to|is)\b',
    'es': r'\b(el|la|de|que|y)\b|[ñ¿¡]',
    'fr': r'\b(le|la|les|de|et)\b|[àâçéèêëîïôûù]',
    'de': r'\b(der|die|das|und|ist)\b|[äöüß]',
    'zh': r'[一-鿿]',
}


def normalize_text(col: ColumnOrName) -> SparkCol:
    """Canonical form for dedup: lowercase, collapse whitespace, trim."""
    c = convert_to_spark_col(col)
    return F.trim(F.regexp_replace(F.lower(c), r'\s+', ' '))


def strip_html(col: ColumnOrName) -> SparkCol:
    """Remove HTML: script/style blocks (with their content), all
    tags, and the common entities. Pure JVM regex — no UDF."""
    c = convert_to_spark_col(col)
    c = F.regexp_replace(c, r'(?is)<(script|style)[^>]*>.*?</\1>', ' ')
    c = F.regexp_replace(c, r'<[^>]+>', ' ')
    # Entity strings contain no regex metacharacters, so they are
    # literal-safe patterns; &amp; decodes LAST so '&amp;lt;' doesn't
    # double-decode.
    for entity, char in (
        ('&lt;', '<'), ('&gt;', '>'), ('&quot;', '"'),
        ('&#39;', "'"), ('&nbsp;', ' '), ('&amp;', '&'),
    ):
        c = F.regexp_replace(c, entity, char)
    return c


_BLOCK_TAG_RE = (
    r'(?i)</?(?:p|div|td|th|li|h[1-6]|section|article|aside|nav|'
    r'header|footer|ul|ol|table|tr|br|blockquote|main)[^>]*>')


def html_blocks(col: ColumnOrName) -> SparkCol:
    """The block-level candidate fragments of an HTML page
    (``array<string>``): split on block-element tags, trim, drop
    empties.  Inline markup (anchors, spans, bold) stays inside each
    fragment — :func:`link_density` needs it.  Pure codegen."""
    c = convert_to_spark_col(col)
    return F.filter(
        F.transform(F.split(c, _BLOCK_TAG_RE), lambda b: F.trim(b)),
        lambda b: b != '')


def _fragment_text(b: SparkCol) -> SparkCol:
    """Inline tags removed, trimmed — the visible text of a block
    fragment (exact: tags delete to '', unlike :func:`strip_html`'s
    space substitution, so planted text round-trips byte-for-byte)."""
    return F.trim(F.regexp_replace(b, '<[^>]+>', ''))


def _link_density_expr(b: SparkCol) -> SparkCol:
    """anchor-text chars / visible-text chars of one fragment
    (1.0 for fragments with no visible text — all-markup blocks are
    boilerplate by definition)."""
    anchors = F.regexp_extract_all(
        b, F.lit(r'(?is)<a\s[^>]*>([^<]*)</a>'), 1)
    a_chars = F.aggregate(
        anchors, F.lit(0), lambda acc, t: acc + F.length(t))
    total = F.length(_fragment_text(b))
    return F.when(total > 0, a_chars / total).otherwise(F.lit(1.0))


def link_density(col: ColumnOrName) -> SparkCol:
    """Anchor-text chars over visible-text chars of an HTML fragment
    — the jusText/boilerpipe boilerplate signal (navigation chrome is
    mostly links; body prose is not)."""
    return _link_density_expr(convert_to_spark_col(col))


def extract_main_text(
    col: ColumnOrName,
    max_link_density: float = 0.33,
    min_words: int = 5,
) -> SparkCol:
    """Boilerplate-removed page text: keep the block fragments that
    read like prose (link density ≤ ``max_link_density`` AND at
    least ``min_words`` visible words — the two classic
    jusText/boilerpipe gates), strip their inline markup, and join
    with newlines.

    One chain of array expressions inside whole-stage codegen — no
    UDF, no explode, no shuffle: at 100 TB this runs in the scan
    projection right after WARC ingest + :func:`~ons_utils_spark.
    operators.web.sniff_mime` routing.  Entities are NOT decoded
    here (run :func:`clean_text` downstream for corpus cleanup);
    script/style content is dropped first so code never counts as
    prose.
    """
    c = convert_to_spark_col(col)
    c = F.regexp_replace(c, r'(?is)<(script|style)[^>]*>.*?</\1>', ' ')
    keep = F.filter(
        html_blocks(c),
        lambda b: (_link_density_expr(b) <= max_link_density)
        & (F.size(F.split(_fragment_text(b), r'\s+')) >= min_words))
    return F.array_join(F.transform(keep, _fragment_text), '\n')


def clean_text(col: ColumnOrName) -> SparkCol:
    """Training-corpus cleanup: strip HTML, drop C0 controls, DEL, and
    C1 controls (U+0080-U+009F — common in mojibake web text), collapse
    whitespace. Case is preserved (use :func:`normalize_text`
    afterwards for dedup canonicalization)."""
    c = strip_html(col)
    c = F.regexp_replace(c, r'[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '')
    return F.trim(F.regexp_replace(c, r'\s+', ' '))


# PII patterns deliberately use no backreferences/lookarounds so the
# same pattern runs on Java regex (Spark) and RE2 (DuckDB oracle).
# Order matters: emails before phones (digits in domains), IPs before
# phones (dotted runs of digits).
PII_PATTERNS = (
    (r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>'),
    (r'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>'),
    (r'\+?\d[\d() -]{7,}\d', '<PHONE>'),
)


def redact_pii(col: ColumnOrName) -> SparkCol:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    ``<EMAIL>``/``<IP>``/``<PHONE>`` tokens. Pure JVM regex — runs at
    scan speed; patterns are RE2-safe so oracles can mirror them."""
    c = convert_to_spark_col(col)
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def repetition_score(col: ColumnOrName, n: int = 2) -> SparkCol:
    """Fraction of duplicated word n-grams: ``1 - distinct/total`` in
    [0, 1] (0 for texts shorter than ``n`` tokens).

    The Gopher-style repetition signal for corpus filtering: boiler-
    plate and spam repeat phrases, clean prose doesn't. Built from the
    same shifted-slice ``zip_with`` shingling as dedup (O(tokens),
    JVM-only).
    """
    toks = tokenize(normalize_text(col))
    k = F.size(toks) - (n - 1)
    shingled = F.slice(toks, 1, F.greatest(k, F.lit(0)))
    for offset in range(1, n):
        shifted = F.slice(toks, offset + 1, F.greatest(k, F.lit(0)))
        shingled = F.zip_with(
            shingled, shifted, lambda a, b: F.concat_ws(' ', a, b)
        )
    return F.when(
        k >= 1,
        1.0 - F.size(F.array_distinct(shingled)).cast('double')
        / F.size(shingled),
    ).otherwise(F.lit(0.0))


def chunk_text(
    col: ColumnOrName,
    chunk_tokens: int = 512,
    overlap_tokens: int = 0,
) -> SparkCol:
    """Split text into overlapping token-window chunks →
    ``array<string>`` (empty array for blank text).

    The context-window chunking step of an LLM training pipeline:
    chunk starts advance by ``chunk_tokens - overlap_tokens``; each
    chunk holds up to ``chunk_tokens`` whitespace tokens. Pure JVM
    (``sequence`` + ``transform`` + ``slice``) — one pass, no UDF, no
    shuffle; fan-out to one-row-per-chunk is the caller's
    ``posexplode``.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            'need 0 <= overlap_tokens < chunk_tokens, got '
            f'{overlap_tokens} / {chunk_tokens}'
        )
    step = chunk_tokens - overlap_tokens
    toks = tokenize(col)
    n = F.size(toks)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n, F.lit(step)),
            lambda s: F.array_join(
                F.slice(toks, s, chunk_tokens), ' '
            ),
        ),
    ).otherwise(F.array().cast('array<string>'))


def dedup_lines(col: ColumnOrName) -> SparkCol:
    """Remove duplicate lines within a document, keeping first
    occurrence order — the within-page boilerplate strip (repeated
    nav/footer lines). ``array_distinct`` preserves first-occurrence
    order; blank/whitespace-only lines are dropped entirely."""
    c = convert_to_spark_col(col)
    # NB: the lambda must be unary — a bare F.trim exposes a second
    # optional parameter and pyspark then binds the (element, index)
    # form, silently trimming the index instead of whitespace.
    lines = F.filter(
        F.transform(F.split(c, r'\n'), lambda ln: F.trim(ln)),
        lambda ln: ln != '',
    )
    return F.array_join(F.array_distinct(lines), '\n')


def tokenize(col: ColumnOrName) -> SparkCol:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    c = convert_to_spark_col(col)
    return F.filter(
        F.split(F.trim(c), r'\s+'), lambda x: x != F.lit('')
    )


def token_count(col: ColumnOrName) -> SparkCol:
    """Number of whitespace tokens."""
    return F.size(tokenize(col))


def bpe_ish_token_count(col: ColumnOrName) -> SparkCol:
    """Approximate BPE token count: word-pieces + digits + punctuation.

    A regex proxy for tokenizer-based counting (count of alphanumeric
    runs and individual punctuation marks) — the standard cheap
    estimator when the real tokenizer can't run JVM-side.
    """
    c = convert_to_spark_col(col)
    pieces = F.regexp_extract_all(c, F.lit(r'[A-Za-z0-9]{1,4}|[^\sA-Za-z0-9]'), 0)
    return F.size(pieces)


def char_count(col: ColumnOrName) -> SparkCol:
    """Character length."""
    return F.length(convert_to_spark_col(col))


def stopword_ratio(
    col: ColumnOrName,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> SparkCol:
    """Fraction of tokens that are stopwords (0.0 for empty docs).

    Membership via ``isin`` (optimized to an O(1) InSet probe per
    token) — an ``array_contains`` against a literal array costs
    O(|stopwords|) interpreted comparisons per token instead.
    """
    toks = tokenize(col)
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    )
    n = F.size(toks)
    return F.when(n > 0, n_stop.cast('double') / n).otherwise(F.lit(0.0))


def punct_ratio(col: ColumnOrName) -> SparkCol:
    """Fraction of characters that are punctuation (0.0 for empty)."""
    c = convert_to_spark_col(col)
    n = F.length(c)
    n_punct = n - F.length(F.regexp_replace(c, r'[^\w\s]', ''))
    return F.when(n > 0, n_punct.cast('double') / n).otherwise(F.lit(0.0))


def mean_word_length(col: ColumnOrName) -> SparkCol:
    """Mean token length (0.0 for empty docs)."""
    toks = tokenize(col)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast('double') / n).otherwise(F.lit(0.0))


def quality_score(
    col: ColumnOrName,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> SparkCol:
    """Heuristic [0,1] document-quality score.

    Combines length fitness, stopword presence, and punctuation sanity
    — the usual pre-training filter features (Gopher/C4-style rules),
    expressed as one codegen'd column expression.
    """
    n = token_count(col)
    length_ok = (
        F.when((n >= min_tokens) & (n <= max_tokens), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    stop_component = F.least(
        stopword_ratio(col) * 5.0, F.lit(1.0)
    )  # saturates at 20% stopwords
    punct_component = F.lit(1.0) - F.least(
        punct_ratio(col) * 4.0, F.lit(1.0)
    )  # degrades past 25% punctuation
    wl = mean_word_length(col)
    word_len_ok = (
        F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    score = (
        length_ok * 0.4 + stop_component * 0.2
        + punct_component * 0.2 + word_len_ok * 0.2
    )
    # NULL text is "no document", not a 0.2-quality one (the punct
    # term's ELSE branch would otherwise leak through the nulls).
    return F.when(
        convert_to_spark_col(col).isNull(), F.lit(0.0)
    ).otherwise(score)


# Gopher's "required words": a doc passing the stopword rule must
# contain at least `min_stopwords` distinct members of this list
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", table A1).
GOPHER_STOPWORDS = ('the', 'be', 'to', 'of', 'and',
                    'that', 'have', 'with')


def gopher_quality_flags(
    df,
    col: ColumnOrName = 'text',
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopwords: int = 2,
):
    """Add Gopher-rule boolean flag columns + ``gopher_pass``.

    The per-RULE tidy twin of :func:`quality_score` (which collapses
    to one number): each published Gopher filter becomes its own
    boolean column so a corpus run can report WHICH rule rejects
    documents — the debugging surface every filtering pipeline needs.

    Every ratio threshold is evaluated as an INTEGER cross-multiplied
    comparison (e.g. mean word length ∈ [3, 10] becomes
    ``3·n_words ≤ n_word_chars ≤ 10·n_words``), so the flags are
    bit-exact across engines — no float division anywhere, and the
    whole thing is one codegen'd projection (no UDFs, no shuffle).

    Rules (flag TRUE = rule passed):

    * ``g_words``      — word count in [min_words, max_words]
    * ``g_word_len``   — mean word length in [min, max]
    * ``g_symbols``    — (# + … occurrences) / words ≤ 1/10
    * ``g_bullets``    — lines starting with a bullet ≤ 9/10, the
      published Gopher threshold (Rae et al. 2021, also the value
      used by DataTrove / NeMo Curator / Dolma)
    * ``g_ellipsis``   — lines ending in an ellipsis ≤ 3/10
    * ``g_alpha``      — words containing a letter ≥ 8/10
    * ``g_stopwords``  — ≥ ``min_stopwords`` distinct required words
    * ``gopher_pass``  — all of the above
    """
    c = convert_to_spark_col(col)
    # Stage the token/line arrays as their OWN aliased projections:
    # the flag expressions reference them 10+ times, the Project
    # containing them is interpreted (higher-order filter lambdas
    # disable whole-stage codegen), and CollapseProject refuses to
    # duplicate a non-cheap aliased expression — so the tokenize
    # regex pipeline runs once per row instead of once per flag
    # (the plan previously repeated it ~10x per row).
    staged = df.withColumns({
        '__g_toks': tokenize(normalize_text(c)),
        '__g_lines': F.split(c, '\n'),
    })
    toks, lines = F.col('__g_toks'), F.col('__g_lines')
    counted = staged.withColumns({
        '__g_n_words': F.size(toks),
        # total in-word chars: join is one pass, no per-token lambda
        '__g_n_word_chars': F.length(F.array_join(toks, '')),
        '__g_n_symbols': F.regexp_count(c, F.lit(r'#|\.\.\.|…')),
        '__g_n_lines': F.size(lines),
        '__g_n_bullet': F.size(F.filter(
            lines, lambda x: F.ltrim(x).rlike(r'^[-*•]'))),
        '__g_n_ellipsis': F.size(F.filter(
            lines, lambda x: F.rtrim(x).rlike(r'(\.\.\.|…)$'))),
        '__g_n_alpha': F.size(F.filter(
            toks, lambda t: t.rlike('[a-z]'))),
        '__g_n_stop': F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))),
    })
    n_words = F.col('__g_n_words')
    n_word_chars = F.col('__g_n_word_chars')
    n_lines = F.col('__g_n_lines')
    flags = {
        'g_words': (n_words >= min_words) & (n_words <= max_words),
        'g_word_len': (n_word_chars >= min_mean_word_len * n_words)
        & (n_word_chars <= max_mean_word_len * n_words),
        'g_symbols': F.col('__g_n_symbols') * 10 <= n_words,
        'g_bullets': F.col('__g_n_bullet') * 10 <= n_lines * 9,
        'g_ellipsis': F.col('__g_n_ellipsis') * 10 <= n_lines * 3,
        'g_alpha': F.col('__g_n_alpha') * 10 >= n_words * 8,
        'g_stopwords': F.col('__g_n_stop') >= min_stopwords,
    }
    out = counted.withColumns(flags)
    passed = None
    for name in flags:
        passed = F.col(name) if passed is None \
            else passed & F.col(name)
    return out.withColumn('gopher_pass', passed).drop(
        '__g_toks', '__g_lines', '__g_n_words', '__g_n_word_chars',
        '__g_n_symbols', '__g_n_lines', '__g_n_bullet',
        '__g_n_ellipsis', '__g_n_alpha', '__g_n_stop')


def c4_quality_flags(
    df: SparkDF,
    col: ColumnOrName = 'text',
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    policy_words: Sequence[str] = ('javascript',),
    bad_phrases: Sequence[str] = ('lorem ipsum',),
):
    """C4 cleaning (Raffel et al. 2020, §2.2) as line-level repair +
    page-level flags — the other canonical web-corpus recipe next to
    :func:`gopher_quality_flags`.

    Line rules (a line survives into ``c4_text`` iff ALL hold):

    * ends in a terminal punctuation mark (``. ! ? "``),
    * has at least ``min_words_per_line`` whitespace words,
    * contains none of ``policy_words`` (C4 drops any line with the
      word "javascript" — cookie/JS boilerplate).

    Page flags (TRUE = rule passed; C4 drops the whole page):

    * ``c4_lines``     — the retained text still has at least
      ``min_sentences`` sentences (terminal-punct count),
    * ``c4_no_badword``— none of ``bad_phrases`` anywhere on the raw
      page (stand-in for the public bad-words list, which callers
      pass in),
    * ``c4_no_brace``  — no curly bracket (code, not prose),
    * ``c4_pass``      — all of the above.

    Adds ``c4_text`` (the retained lines re-joined), ``n_kept_lines``
    and ``n_sentences`` alongside the flags.  One codegen'd
    projection — the line filter is a higher-order ``filter`` over
    the split array, every test is a regex/substring the JVM
    evaluates, and there is no shuffle and no UDF, so the recipe runs
    at parquet-scan speed at corpus scale.  Engine-portable: an ANSI
    engine with list lambdas replays every rule (``q_c4_filters``).
    """
    c = convert_to_spark_col(col)
    low_policy = [w.lower() for w in policy_words]
    low_bad = [p.lower() for p in bad_phrases]

    def _keep(line):
        ok = F.rtrim(line).rlike('[.!?"]$') & (
            F.size(F.split(F.trim(line), r'\s+'))
            >= min_words_per_line)
        for w in low_policy:
            ok = ok & ~F.contains(F.lower(line), F.lit(w))
        return ok

    staged = df.withColumns({
        '__c4_kept': F.filter(F.split(c, '\n'), _keep),
    })
    kept = F.col('__c4_kept')
    counted = staged.withColumns({
        'c4_text': F.array_join(kept, '\n'),
        'n_kept_lines': F.size(kept),
    }).withColumn(
        'n_sentences', F.regexp_count(F.col('c4_text'), F.lit('[.!?]')))
    no_bad = None
    for p in low_bad:
        cond = ~F.contains(F.lower(c), F.lit(p))
        no_bad = cond if no_bad is None else no_bad & cond
    flags = {
        'c4_lines': F.col('n_sentences') >= min_sentences,
        'c4_no_badword': no_bad if no_bad is not None else F.lit(True),
        'c4_no_brace': ~F.contains(c, F.lit('{')),
    }
    out = counted.withColumns(flags)
    passed = None
    for name in flags:
        passed = F.col(name) if passed is None else passed & F.col(name)
    return out.withColumn('c4_pass', passed).drop('__c4_kept')


def language_id(col: ColumnOrName) -> SparkCol:
    """Heuristic language ID over marker-pattern hit counts.

    Scores each language by regexp marker density and returns the
    argmax ('und' when nothing matches). Deterministic, JVM-side.
    """
    c = convert_to_spark_col(col)
    scores = [
        (lang, F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0)))
        for lang, pat in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit('und')
    # Reverse order so earlier languages win ties.
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: ColumnOrName, bits: int = 64) -> SparkCol:
    """Deterministic document fingerprint of the normalized text.

    ``bits=64`` → xxhash64 (bigint, cheapest); ``bits=128`` → md5 hex
    (portable across engines — DuckDB computes the same value, which
    is what the correctness oracle uses).
    """
    norm = normalize_text(col)
    if bits == 64:
        # xxhash64(NULL) yields the seed (42), which would make every
        # null document a "duplicate"; propagate NULL like md5 does.
        return F.when(norm.isNotNull(), F.xxhash64(norm))
    if bits == 128:
        return F.md5(norm)
    raise ValueError('bits must be 64 or 128')


def text_stats(
    df: SparkDF,
    text_col: str = 'text',
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> SparkDF:
    """Attach the standard per-document text-analysis columns."""
    return df.select(
        '*',
        token_count(text_col).alias('n_tokens'),
        char_count(text_col).alias('n_chars_computed'),
        mean_word_length(text_col).alias('mean_word_len'),
        stopword_ratio(text_col, stopwords).alias('stopword_ratio'),
        punct_ratio(text_col).alias('punct_ratio'),
        quality_score(text_col).alias('quality'),
        language_id(text_col).alias('lang_pred'),
        fingerprint(text_col, 128).alias('fingerprint'),
    )


def compression_ratio(col: ColumnOrName, level: int = 6) -> SparkCol:
    """zlib compressed-size / raw-size per document — the classic
    "compressibility" quality signal (boilerplate and machine-
    generated spam compress far better than natural prose; filters in
    the Gopher/Dolma lineage cut on exactly this ratio).

    The ONE deliberate exception to this module's no-Python-UDF rule:
    a DEFLATE pass has no ``pyspark.sql.functions`` equivalent, so
    this is an Arrow-batched pandas UDF (bulk column transfer; the
    per-row codec call is the irreducible cost). At 100 TB this runs
    where the data is — no shuffle, no state, scales linearly with
    executors; zlib level 6 throughput (~50-100 MB/s/core) keeps it
    scan-bound, and the deterministic codec makes results
    retry-stable. Empty/NULL documents yield NULL (a 0-byte doc has
    no meaningful ratio).
    """
    from pyspark.sql.functions import pandas_udf

    c = convert_to_spark_col(col)

    @pandas_udf('double')
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(s):
            if s is None:
                return None
            raw = s.encode('utf-8', errors='replace')
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return _ratio(c)


def zipf_slope(df, text_col: str = 'text', top_k: int = 1000):
    """Zipf's-law fit over the corpus token frequency distribution:
    ONE row ``(n_types, slope, intercept, freq_rank_corr)`` from a
    log-log regression of frequency on rank over the ``top_k`` most
    frequent tokens (rank ties broken by token, so the fit is
    deterministic).  A healthy natural-language corpus sits near
    slope -1 (Zipf 1949); boilerplate-heavy or template-generated
    corpora flatten the head, deduplication failures fatten it —
    this is the one-number corpus-health diagnostic a data pipeline
    tracks per snapshot/source.

    Scale shape: tokenize + explode + ONE token-keyed count with
    map-side partials (the only corpus-sized shuffle).  The top-k
    head is ``orderBy().limit(k)`` — Spark plans that as
    TakeOrderedAndProject (per-partition heaps merged at the
    driver), NEVER a single-task global sort of the vocabulary —
    and only then does a window rank the k surviving rows (bounded
    single partition by construction) before one regression
    aggregate.
    """
    from pyspark.sql import Window

    toks = (df.select(F.explode(tokenize(text_col)).alias('tok'))
            .groupBy('tok').agg(F.count(F.lit(1)).alias('freq')))
    w = Window.orderBy(F.col('freq').desc(), F.col('tok').asc())
    head = (toks.orderBy(F.col('freq').desc(), F.col('tok').asc())
            .limit(top_k)
            .withColumn('rank', F.row_number().over(w)))
    return head.agg(
        F.count(F.lit(1)).alias('n_types'),
        F.round(F.regr_slope(F.ln('freq'), F.ln('rank')), 6)
        .alias('slope'),
        F.round(F.regr_intercept(F.ln('freq'), F.ln('rank')), 6)
        .alias('intercept'),
        F.round(F.corr(F.ln('freq'), F.ln('rank')), 6)
        .alias('freq_rank_corr'))


def token_surprisal(
    df: SparkDF,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    head_k: int = 1000,
) -> SparkDF:
    """Per-document mean unigram self-information ("surprisal", in
    bits) under the corpus's OWN empirical unigram model — the cheap
    novelty/quality signal data-selection recipes rank by: rare-token-
    heavy documents score high, stopword/boilerplate-heavy documents
    score low (self-information filtering is the unigram end of the
    CCNet/DSIR model-scoring spectrum; no reference counterpart —
    LLM-pipeline extension surface).

    Two passes over the tokens: (1) ONE token-keyed census (map-side
    partial combine collapses hot tokens per map task) producing the
    unigram model; (2) score the exploded corpus against it.  The
    100 TB shape of pass 2 is skew-aware: the ``head_k`` hottest
    tokens — stopwords, orders of magnitude hotter than the tail —
    resolve through a BROADCAST join (TakeOrderedAndProject head,
    never a global vocab sort), so the only remaining shuffle join is
    keyed by tail tokens and the stopword skew never hits the wire.
    The corpus-total denominator rides along as a broadcast one-row
    frame: no driver collect, the plan stays lazy end-to-end.

    Returns ``(id_col, n_tokens, mean_surprisal)``; the mean is in
    bits, rounded to 6 places (engine-portable: ``log2`` of integer
    frequencies, order-insensitive to ~1e-13 before rounding).
    Token-less documents are absent (nothing to score) — callers
    left-join if they need them flagged.
    """
    toks = df.select(F.col(id_col).alias('__id'),
                     F.explode(tokenize(text_col)).alias('tok'))
    census = toks.groupBy('tok').agg(F.count(F.lit(1)).alias('freq'))
    total = census.agg(F.sum('freq').alias('__n_total'))
    head = (census.orderBy(F.col('freq').desc(), F.col('tok').asc())
            .limit(head_k)
            .withColumnRenamed('freq', '__head_freq'))
    marked = toks.join(F.broadcast(head), 'tok', 'left')
    hot = (marked.filter(F.col('__head_freq').isNotNull())
           .select('__id', F.col('__head_freq').alias('freq')))
    cold = (marked.filter(F.col('__head_freq').isNull())
            .select('__id', 'tok')
            .join(census, 'tok')
            .select('__id', 'freq'))
    scored = (hot.unionByName(cold)
              .join(F.broadcast(total), how='cross'))
    return (scored.groupBy(F.col('__id').alias(id_col))
            .agg(F.count(F.lit(1)).alias('n_tokens'),
                 F.round(
                     F.avg(F.log2('__n_total') - F.log2('freq')), 6)
                 .alias('mean_surprisal')))


def _positional_ngrams(toks: SparkCol, n: int) -> SparkCol:
    """Positional (non-distinct) word n-grams via the O(tokens)
    shifted-slice ``zip_with`` chain; empty array when the text has
    fewer than ``n`` tokens."""
    k = F.size(toks) - (n - 1)
    shingled = F.slice(toks, 1, F.greatest(k, F.lit(0)))
    for offset in range(1, n):
        shifted = F.slice(toks, offset + 1, F.greatest(k, F.lit(0)))
        shingled = F.zip_with(
            shingled, shifted, lambda a, b: F.concat_ws(' ', a, b))
    return F.when(k >= 1, shingled) \
        .otherwise(F.array().cast('array<string>'))


def _dup_chars(sorted_arr: SparkCol) -> SparkCol:
    """Characters across occurrences of values appearing more than
    once in an ALREADY-SORTED array: charge every element equal to
    a neighbor — O(L) per row, no shuffle, no UDF.

    The argument MUST be a bound column holding the sorted array
    (stage ``array_sort(...)`` behind its own projection first):
    an inline expression here is re-evaluated once per ELEMENT by
    the interpreted higher-order lambda (no CSE inside lambda
    bodies) — measured 50s → 3s on the 500-doc fixture when the
    sort chain was inlined.
    """
    s = sorted_arr
    L = F.size(s)
    # sequence(1, 0) DESCENDS and element_at(s, 0) throws — guard
    # the empty array before building the index sequence.
    return F.when(L >= 1, F.aggregate(
        F.sequence(F.lit(1), F.greatest(L, F.lit(1))),
        F.lit(0).cast('bigint'),
        lambda acc, i: acc + F.when(
            (F.element_at(s, i) == F.element_at(
                s, F.when(i > 1, i - 1).otherwise(1)))
            & (i > 1)
            | (F.element_at(s, i) == F.element_at(
                s, F.when(i < L, i + 1).otherwise(L)))
            & (i < L),
            F.length(F.element_at(s, i)).cast('bigint'))
        .otherwise(F.lit(0).cast('bigint')))) \
        .otherwise(F.lit(0).cast('bigint'))


def _top_run_chars(sorted_arr: SparkCol) -> SparkCol:
    """``count × length`` of the most frequent value in an
    ALREADY-SORTED array (ties → lexicographically smallest, an
    artifact of keeping the FIRST maximal run).  One struct-state
    fold — O(L) per row, zero shuffle.  Same staging contract as
    :func:`_dup_chars`."""
    s = sorted_arr
    init = F.struct(
        F.lit('').alias('prev'),
        F.lit(0).cast('bigint').alias('run'),
        F.lit(0).cast('bigint').alias('best'),
        F.lit('').alias('bestg'))
    folded = F.aggregate(
        s, init,
        lambda acc, x: F.struct(
            x.alias('prev'),
            F.when(x == acc['prev'], acc['run'] + 1)
            .otherwise(F.lit(1).cast('bigint')).alias('run'),
            F.when(
                F.when(x == acc['prev'], acc['run'] + 1)
                .otherwise(F.lit(1)) > acc['best'],
                F.when(x == acc['prev'], acc['run'] + 1)
                .otherwise(F.lit(1)).cast('bigint'))
            .otherwise(acc['best']).alias('best'),
            F.when(
                F.when(x == acc['prev'], acc['run'] + 1)
                .otherwise(F.lit(1)) > acc['best'], x)
            .otherwise(acc['bestg']).alias('bestg')))
    return folded['best'] * F.length(folded['bestg']).cast('bigint')


def gopher_repetition_flags(
    df: SparkDF,
    col: ColumnOrName = 'text',
    line_delimiter: str = '\n',
    paragraph_delimiter: str = '\n\n',
):
    """The FULL Gopher repetition-removal suite (Rae et al. 2021,
    Table A1 — the thresholds Dolma/DataTrove/NeMo-Curator ship):
    thirteen per-document rules, each a boolean flag column
    (TRUE = rule passed), plus ``repetition_pass``:

    * ``r_dup_line`` / ``r_dup_para``       — fraction of lines /
      paragraphs that are duplicates of another ≤ 30%
    * ``r_dup_line_char`` / ``r_dup_para_char`` — fraction of
      characters inside those duplicates ≤ 20%
    * ``r_top2 r_top3 r_top4``              — characters in the
      most frequent 2/3/4-gram ≤ 20/18/16%
    * ``r_dup5 … r_dup10``                  — characters in
      duplicated 5..10-grams ≤ 15/14/13/12/11/10%

    Operationalization notes (documented deviations shared by the
    public reimplementations): character fractions count every
    OCCURRENCE of a duplicated item (overlap-counted, not the
    span-union of the original paper's prose — the Dolma choice);
    n-gram characters include their single inner spaces; the
    denominator is the character length of the normalized text for
    n-gram rules and the summed item lengths for line/paragraph
    rules.  Every threshold is an integer cross-multiplied
    comparison — no float division, bit-exact on any engine
    (``q_gopher_repetition``).

    Scale shape: ONE codegen projection per document — sorted-run
    folds (`O(L log L)` per row) replace the per-doc hash maps of
    the single-node reimplementations; no shuffle, no UDF, so the
    whole suite runs at parquet-scan speed.  Compose with
    :func:`gopher_quality_flags` (the non-repetition half of
    Table A1).
    """
    c = convert_to_spark_col(col)
    staged = df.withColumns({
        '__r_toks': tokenize(normalize_text(c)),
        '__r_lines': F.filter(
            F.transform(F.split(c, '\\Q' + line_delimiter + '\\E'),
                        lambda x: F.trim(x)),
            lambda x: x != ''),
        '__r_paras': F.filter(
            F.transform(
                F.split(c, '\\Q' + paragraph_delimiter + '\\E'),
                lambda x: F.trim(x)),
            lambda x: x != ''),
    })
    toks = F.col('__r_toks')
    # n-gram levels CHAIN: level n extends the STAGED level n-1 with
    # one zip_with instead of rebuilding its whole prefix chain —
    # 9 zip_with passes total instead of 45 (r15: the gram build was
    # the dominant flags cost, 2.3 → 1.4 s at sf0.1).  Each staged
    # level is referenced twice (next level + its own sort), which
    # keeps CollapseProject from re-inlining the chain.
    staged = staged.withColumn('__ug2', _positional_ngrams(toks, 2))
    for n in range(3, 11):
        k = F.size(toks) - (n - 1)
        prev = F.slice(F.col(f'__ug{n - 1}'), 1,
                       F.greatest(k, F.lit(0)))
        shifted = F.slice(toks, n, F.greatest(k, F.lit(0)))
        staged = staged.withColumn(
            f'__ug{n}',
            F.when(k >= 1, F.zip_with(
                prev, shifted, lambda a, b: F.concat_ws(' ', a, b)))
            .otherwise(F.array().cast('array<string>')))
    # SORTED arrays staged behind their own projection: the fold
    # helpers index them element-by-element, and an inlined
    # array_sort(chain) would re-evaluate once per ELEMENT inside
    # the interpreted lambdas (no CSE there) — measured 53s → ~3s
    # on the 500-doc fixture.
    sorted_stage = {
        '__rs_line': F.array_sort(F.col('__r_lines')),
        '__rs_para': F.array_sort(F.col('__r_paras')),
    }
    for n in range(2, 11):
        sorted_stage[f'__rs_g{n}'] = F.array_sort(F.col(f'__ug{n}'))
    staged = staged.withColumns(sorted_stage)
    text_chars = F.length(F.array_join(toks, ' ')).cast('bigint')

    cols = {}
    evid = {}

    def item_rules(tag, dup_pct, char_pct):
        arr = F.col(f'__rs_{tag}')
        evid[f'__{tag}_n'] = F.size(arr).cast('bigint')
        evid[f'__{tag}_nd'] = F.size(
            F.array_distinct(arr)).cast('bigint')
        evid[f'__{tag}_chars'] = F.aggregate(
            arr, F.lit(0).cast('bigint'),
            lambda acc, x: acc + F.length(x))
        evid[f'__{tag}_dupc'] = _dup_chars(arr)
        cols[f'r_dup_{tag}'] = (
            (F.col(f'__{tag}_n') - F.col(f'__{tag}_nd')) * 100
            <= dup_pct * F.col(f'__{tag}_n'))
        cols[f'r_dup_{tag}_char'] = (
            F.col(f'__{tag}_dupc') * 100
            <= char_pct * F.col(f'__{tag}_chars'))

    item_rules('line', 30, 20)
    item_rules('para', 30, 20)

    for n, pct in ((2, 20), (3, 18), (4, 16)):
        evid[f'__top{n}'] = _top_run_chars(F.col(f'__rs_g{n}'))
        cols[f'r_top{n}'] = (
            F.col(f'__top{n}') * 100 <= pct * F.greatest(
                text_chars, F.lit(1)))
    for n, pct in ((5, 15), (6, 14), (7, 13), (8, 12), (9, 11),
                   (10, 10)):
        evid[f'__dup{n}'] = _dup_chars(F.col(f'__rs_g{n}'))
        cols[f'r_dup{n}'] = (
            F.col(f'__dup{n}') * 100 <= pct * F.greatest(
                text_chars, F.lit(1)))

    out = staged.withColumns(evid).withColumns(cols)
    passed = None
    for name in cols:
        passed = F.col(name) if passed is None \
            else passed & F.col(name)
    return out.withColumn('repetition_pass', passed).drop(
        '__r_toks', '__r_lines', '__r_paras',
        *[f'__ug{n}' for n in range(2, 11)],
        *sorted_stage.keys(), *evid.keys())
