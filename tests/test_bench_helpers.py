"""Pin bench.py's harness invariants (r11 postmortem: the driver's
bench artifact collapsed to a repeat=0 cold fallback because the
first-pass estimate used the warmup wall).

These tests are pure-Python — no SparkSession."""
from __future__ import annotations

import ast
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _queries_cached_by_ast() -> set:
    """Re-derive the artifact-cached query set from queries.py source:
    every registered query whose call graph (within the module)
    reaches `_artifact` / `_cached_*`."""
    src = open(os.path.join(
        ROOT, 'ons_utils_spark', 'plans', 'queries.py')).read()
    tree = ast.parse(src)
    funcs = {n.name: n for n in ast.walk(tree)
             if isinstance(n, ast.FunctionDef)}
    calls: dict = {}
    for name, node in funcs.items():
        cs = set()
        for c in ast.walk(node):
            if isinstance(c, ast.Call):
                f = c.func
                if isinstance(f, ast.Name):
                    cs.add(f.id)
                elif isinstance(f, ast.Attribute):
                    cs.add(f.attr)
        calls[name] = cs
    cache_fns = {'_artifact', '_cached_pq_books',
                 '_cached_ivf_centroids', '_cached_pq_codes'}

    def cached(fn: str, seen: set) -> bool:
        if fn in seen or fn not in calls:
            return False
        seen.add(fn)
        if calls[fn] & cache_fns:
            return True
        return any(cached(c, seen) for c in calls[fn] if c in funcs)

    from ons_utils_spark.plans.queries import QUERIES
    return {q for q in QUERIES if cached(q, set())}


def test_artifact_cached_list_matches_queries_source():
    assert set(bench._ARTIFACT_CACHED_QUERIES) == _queries_cached_by_ast()


def test_prior_warm_suite_total_reads_committed_artifact():
    path = os.path.join(ROOT, 'BENCH_full.json')
    if not os.path.exists(path):
        assert bench._prior_warm_suite_total(0.1) is None
        return
    prev = json.load(open(path))
    got = bench._prior_warm_suite_total(prev.get('sf'))
    if prev.get('repeat', 0) >= 1:
        assert got == pytest.approx(float(prev['value']))
    else:
        assert got is None


def test_prior_warm_suite_total_ignores_other_sf():
    """r12 ADVICE: a run at a DIFFERENT sf than the committed
    artifact must fall back to the warmup-wall estimate, not inherit
    the larger corpus's suite total (which would veto every timed
    pass and record the repeat=0 cold fallback)."""
    path = os.path.join(ROOT, 'BENCH_full.json')
    if not os.path.exists(path):
        pytest.skip('no committed BENCH_full.json')
    prev = json.load(open(path))
    other_sf = 0.01 if prev.get('sf') != 0.01 else 0.1
    assert bench._prior_warm_suite_total(other_sf) is None


def test_first_pass_estimate_is_not_warmup_wall_when_prior_exists():
    """The r11 failure shape: warmup 329s under load, estimate =
    warmup wall -> 329 + 329 > 540 -> zero timed passes.  With a
    prior warm artifact the estimate must come from it instead, and
    at the r11 numbers it must admit a first timed pass."""
    path = os.path.join(ROOT, 'BENCH_full.json')
    if not os.path.exists(path):
        pytest.skip('no committed warm BENCH_full.json')
    prev_sf = json.load(open(path)).get('sf')
    prior = bench._prior_warm_suite_total(prev_sf)
    if prior is None:
        pytest.skip('no committed warm BENCH_full.json')
    warmup_r11, budget = 328.8, max(560, 150 + 3.5 * 161)
    est = prior * 1.3
    assert warmup_r11 + est <= budget, (
        'estimate would veto the first timed pass at r11 load')


def test_default_budget_scales_with_suite_size():
    from ons_utils_spark.plans.queries import QUERIES
    budget = max(560, 150 + 3.5 * len(QUERIES))
    # 161 queries: warmup (<=330s loaded) + one warm pass (~175s)
    # must fit, so at least one timed pass always lands.
    assert budget >= 150 + 3.5 * len(QUERIES)
    assert budget >= 700 or len(QUERIES) < 158


def _full(value, controls, heavies=()):
    q = {f'q{i + 1}_ctrl': t for i, t in enumerate(controls)}
    q.update({f'q_heavy_{i}': t for i, t in enumerate(heavies)})
    return {'value': value, 'queries': q}


def test_load_inflated_guard_refuses_uniform_control_inflation():
    """r12 judge finding: equal-repeat run with worse total AND
    uniformly slower TPC-H controls is host load — must divert."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(140.0, [1.4, 1.5, 1.4], [5.6])
    assert bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_lets_faster_run_land():
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(95.0, [1.1, 1.2, 1.1], [2.0])
    assert not bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_lets_quiet_regression_land():
    """A genuine regression reads slower totals under QUIET controls
    (ratio ~1) — it must still displace the artifact so the record
    reflects the real steady state."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(110.0, [1.0, 1.02, 0.99], [14.0])
    assert not bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_handles_missing_prior():
    assert not bench._looks_load_inflated(
        _full(100.0, [1.0]), {})


def test_load_inflated_guard_lets_broader_coverage_land():
    """r13 judge finding: an equal-quality run covering MORE queries
    has a higher raw total by construction; the guard must compare
    the common-query subtotal, not raw values (the 182→184 case that
    needed manual promotion in commit 2bcaf83)."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(130.0, [1.0, 1.01, 0.99], [4.0])
    new['queries']['q_brand_new_a'] = 15.0   # coverage growth only
    new['queries']['q_brand_new_b'] = 8.0
    assert not bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_refuses_bursty_median_inflation():
    """r15 steal postmortem: BURSTY hypervisor load inflates heavy-
    query medians while the scattered sub-second controls stay quiet
    (median ratio ≤ 1.05) — the old controls-only test let such a
    run displace a strictly better same-code record.  When the
    candidate's own per-pass MINS still beat the committed subtotal,
    the median slowdown is bursts, not steady state — divert."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(120.0, [1.0, 1.02, 0.99], [23.0])  # heavy median 23s
    new['queries_min'] = dict(new['queries'], q_heavy_0=3.5)
    assert bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_lets_min_confirmed_regression_land():
    """The flip side: when even the candidate's mins exceed the
    committed subtotal, the slowdown reproduces in every pass — a
    genuine steady-state regression that must be recorded."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(110.0, [1.0, 1.02, 0.99], [14.0])
    new['queries_min'] = {k: v * 0.98 for k, v in new['queries'].items()}
    assert not bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_min_baseline_catches_small_regressions():
    """r15 advisor finding: with the committed artifact carrying
    queries_min, the burst baseline must be the committed MINS, not
    the medians — otherwise any real regression smaller than the
    ~10-25% median-over-min spread keeps candidate mins below the
    committed median subtotal and is diverted forever."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    prev['queries_min'] = {k: v * 0.8 for k, v in prev['queries'].items()}
    new = _full(110.0, [1.0, 1.02, 0.99], [14.0])
    new['queries_min'] = {k: v * 0.9 for k, v in new['queries'].items()}
    # candidate min-subtotal (~15.3) exceeds committed mins (5.6) but
    # controls are quiet: a reproducing regression, must land.
    assert not bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_bursty_against_committed_mins():
    """Bursts still divert under the min-vs-min baseline: candidate
    mins at or below the committed record's own mins prove the code
    can still reach the recorded quiet state."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    prev['queries_min'] = dict(prev['queries'])
    new = _full(120.0, [1.0, 1.02, 0.99], [23.0])
    new['queries_min'] = dict(new['queries'], q_heavy_0=3.5)
    assert bench._looks_load_inflated(new, prev)


def test_load_inflated_guard_still_refuses_inflation_with_growth():
    """Coverage growth must not become a laundering channel: if the
    shared queries ARE uniformly control-inflated, divert even when
    new queries pad the diff."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(160.0, [1.4, 1.5, 1.4], [5.6])
    new['queries']['q_brand_new_a'] = 15.0
    assert bench._looks_load_inflated(new, prev)


def test_artifact_filename_higher_repeat_cannot_launder_load():
    """r15 loophole: a HIGHER-repeat run under intermittent load must
    not displace the quiet record purely on its repeat count — the
    value-aware control check applies at any repeat (observed: a
    repeat-5 run with controls 1.17x auto-promoted over the quiet
    repeat-3 artifact)."""
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(140.0, [1.4, 1.5, 1.4], [5.6])
    name = bench._artifact_filename(
        new, prev, repeat=5, prev_repeat=3,
        prev_sf=0.1, sf_val=0.1, sf='0.1')
    assert name == 'BENCH_full_loaded.json'


def test_artifact_filename_quiet_higher_repeat_lands():
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(101.0, [1.0, 1.01, 0.99], [4.1])
    name = bench._artifact_filename(
        new, prev, repeat=5, prev_repeat=3,
        prev_sf=0.1, sf_val=0.1, sf='0.1')
    assert name == 'BENCH_full.json'


def test_artifact_filename_lower_repeat_and_other_sf_side_files():
    prev = _full(100.0, [1.0, 1.0, 1.0], [4.0])
    new = _full(90.0, [0.9, 0.9, 0.9], [3.0])
    assert bench._artifact_filename(
        new, prev, repeat=2, prev_repeat=3,
        prev_sf=0.1, sf_val=0.1, sf='0.1') == 'BENCH_full_cold.json'
    assert bench._artifact_filename(
        new, prev, repeat=3, prev_repeat=3,
        prev_sf=0.1, sf_val=0.01,
        sf='0.01') == 'BENCH_full_sf0.01.json'


def test_compact_line_stays_under_tail_capture():
    queries = {f'q_{i:03d}': 1.234 for i in range(200)}
    full = {
        'metric': 'suite_total', 'value': 246.8, 'unit': 'sec',
        'queries': queries, 'sf': 0.1, 'repeat': 3,
        'spread': {'suite_min': 1, 'suite_median': 2, 'suite_max': 3},
    }
    line = bench._compact_line(full)
    assert len(line) <= 1800
    doc = json.loads(line)
    assert doc['metric'] == 'suite_total'
