"""Property-based tests (hypothesis) for pure functions.

The reference has no property tests (SURVEY.md §5); these pin the
algebraic properties of the type-promotion lattice and the tuple/dict
utilities that everything else builds on.
"""
from hypothesis import given, settings
from hypothesis import strategies as st

from ons_utils_spark import (
    fill_tuples,
    flatten_dict,
    list_convert,
    promote_dtypes,
    tuple_convert,
    unflatten_dict,
)

NUMERIC = st.sampled_from(
    ['tinyint', 'smallint', 'int', 'bigint', 'float', 'double']
)
ANY_DTYPE = st.sampled_from(
    ['tinyint', 'int', 'bigint', 'float', 'double', 'string',
     'decimal(10,0)', 'decimal(12,2)', 'timestamp', 'boolean']
)


class TestPromoteDtypesProperties:
    @given(st.lists(NUMERIC, min_size=1, max_size=6))
    def test_commutative(self, dtypes):
        assert promote_dtypes(dtypes) == promote_dtypes(dtypes[::-1])

    @given(st.lists(NUMERIC, min_size=1, max_size=6))
    def test_idempotent(self, dtypes):
        out = promote_dtypes(dtypes)
        assert promote_dtypes(dtypes + [out]) == out

    @given(st.lists(NUMERIC, min_size=1, max_size=4), st.data())
    def test_monotone_absorbs_members(self, dtypes, data):
        out = promote_dtypes(dtypes)
        one = data.draw(st.sampled_from(dtypes))
        assert promote_dtypes([one, out]) == out

    @given(st.lists(ANY_DTYPE, min_size=1, max_size=6))
    def test_string_always_wins_or_raises_consistently(self, dtypes):
        try:
            out = promote_dtypes(dtypes)
        except TypeError:
            # mixing non-coercible families — must NOT contain string
            assert 'string' not in dtypes
            return
        if 'string' in dtypes:
            assert out == 'string'

    @given(st.lists(NUMERIC, min_size=1, max_size=6))
    def test_reference_mode_picks_member(self, dtypes):
        # the reference lattice always returns one of its inputs
        assert promote_dtypes(dtypes, mode='reference') in dtypes


class TestFlattenProperties:
    nested = st.recursive(
        st.integers() | st.text(max_size=5),
        lambda children: st.dictionaries(
            st.text(min_size=1, max_size=5), children, max_size=4
        ),
        max_leaves=20,
    )

    @given(st.dictionaries(st.text(min_size=1, max_size=5), nested,
                           min_size=1, max_size=5))
    @settings(max_examples=50)
    def test_roundtrip(self, d):
        # Empty dict leaves can't round-trip (flatten drops them);
        # hypothesis may generate them — prune.
        def prune(x):
            if isinstance(x, dict):
                return {
                    k: prune(v) for k, v in x.items()
                    if not (isinstance(v, dict) and len(v) == 0)
                }
            return x

        d = prune(d)
        # key collisions between dict/non-dict subtrees can't occur in
        # a plain dict, so roundtrip must hold
        assert unflatten_dict(flatten_dict(d)) == d


class TestTupleProperties:
    @given(st.lists(
        st.one_of(
            st.text(max_size=3),
            st.integers(),
            st.lists(st.integers(), min_size=1, max_size=4)
            .map(tuple),
        ),
        min_size=1, max_size=5,
    ))
    def test_fill_tuples_uniform_length(self, tuples):
        out = fill_tuples(tuples)
        if any(isinstance(t, tuple) for t in tuples):
            lengths = {len(tuple_convert(t)) for t in out}
            assert len(lengths) == 1
        else:
            assert out == tuples

    @given(st.one_of(st.text(max_size=5), st.integers(),
                     st.lists(st.integers(), max_size=3)))
    def test_converters_wrap_consistently(self, x):
        t, li = tuple_convert(x), list_convert(x)
        assert list(t) == li
        if isinstance(x, (str, int)):
            assert t == (x,) and li == [x]


class TestConcatProperties:
    """Whole-operator property: concat over random frame sets with
    drifted schemas preserves rows, unions columns in first-seen
    order, null-fills gaps, and promotes dtypes per the lattice."""

    DTYPES = ['int', 'bigint', 'double', 'string']
    COLS = ['c0', 'c1', 'c2']

    @staticmethod
    def _value(dtype, i):
        return str(i) if dtype == 'string' else (
            float(i) if dtype == 'double' else i)

    @given(
        st.lists(
            st.tuples(
                # per-frame: subset of columns with dtypes, row count
                st.dictionaries(
                    st.sampled_from(COLS),
                    st.sampled_from(DTYPES),
                    min_size=1, max_size=3,
                ),
                st.integers(min_value=1, max_value=3),
            ),
            min_size=1, max_size=3,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_concat_invariants(self, spark_session, frame_specs):
        from ons_utils_spark import concat

        frames, first_seen = [], []
        for cols, n_rows in frame_specs:
            for c in cols:
                if c not in first_seen:
                    first_seen.append(c)
            schema = ', '.join(f'{c} {t}' for c, t in cols.items())
            rows = [
                tuple(self._value(t, i) for t in cols.values())
                for i in range(n_rows)
            ]
            frames.append(spark_session.createDataFrame(rows, schema))

        out = concat(frames)
        total = sum(n for _, n in frame_specs)
        assert out.count() == total
        assert out.columns == first_seen

        out_dtypes = dict(out.dtypes)
        rows = out.collect()
        for col in first_seen:
            member = [spec.get(col) for spec, _ in frame_specs]
            expected = promote_dtypes(member, mode='spark')
            assert out_dtypes[col] == expected, (col, member)
            missing_rows = sum(
                n for spec, n in frame_specs if col not in spec)
            assert sum(1 for r in rows if r[col] is None) \
                == missing_rows, col


class TestScd2Properties:
    @staticmethod
    def _ref(rows):
        """Pure-Python SCD2: rows = (uid, minute, state, eid)."""
        out = []
        by_uid = {}
        for uid, t, state, eid in rows:
            by_uid.setdefault(uid, []).append((t, eid, state))
        sentinel = object()
        for uid, evs in by_uid.items():
            evs.sort(key=lambda x: (x[0], x[1]))
            eps, prev = [], sentinel
            for t, eid, state in evs:
                if prev is sentinel or state != prev:
                    eps.append((t, state))
                prev = state
            for i, (t, state) in enumerate(eps):
                vt = eps[i + 1][0] if i + 1 < len(eps) else None
                out.append((uid, state, t, vt, vt is None))
        return sorted(out, key=lambda r: (r[0], r[2]))

    @given(st.lists(
        st.tuples(st.integers(1, 3),          # uid
                  st.integers(0, 30),         # minute
                  st.sampled_from(['a', 'b', None])),
        min_size=1, max_size=25))
    @settings(max_examples=12, deadline=None)
    def test_matches_pure_reference(self, spark_session, raw):
        import datetime as dt
        from ons_utils_spark.operators.scd import scd2_from_events

        base = dt.datetime(2024, 1, 1)
        rows = [(uid, base + dt.timedelta(minutes=m), state, eid)
                for eid, (uid, m, state) in enumerate(raw)]
        df = spark_session.createDataFrame(
            rows, 'uid bigint, t timestamp, state string, eid bigint')
        got = sorted(
            ((r['uid'], r['state'], r['valid_from'],
              r['valid_to'], r['is_current'])
             for r in scd2_from_events(
                 df, 'uid', 't', 'state', 'eid').collect()),
            key=lambda r: (r[0], r[2]))
        ref_rows = [(uid, m, state, eid)
                    for eid, (uid, m, state) in enumerate(raw)]
        want = [(uid, state,
                 base + dt.timedelta(minutes=vf),
                 base + dt.timedelta(minutes=vt) if vt is not None
                 else None,
                 cur)
                for uid, state, vf, vt, cur
                in self._ref(ref_rows)]
        assert got == want


class TestPackingProperties:
    @given(st.lists(st.integers(0, 20), max_size=40),
           st.integers(1, 15))
    def test_pure_recurrence_invariants(self, tokens, budget):
        from ons_utils_spark.operators.packing import _pack_bins

        bins = _pack_bins(tokens, budget)
        assert len(bins) == len(tokens)
        if not tokens:
            return
        # bin ids are dense, non-decreasing, starting at 0
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # every multi-doc bin respects the budget
        fills = {}
        for tc, b in zip(tokens, bins):
            fills.setdefault(b, []).append(tc)
        for b, members in fills.items():
            if len(members) > 1:
                assert sum(members) <= budget
        # maximality: first doc of a bin would NOT have fit the
        # previous bin (greedy never opens a bin early)
        for b in range(1, max(bins) + 1):
            first_idx = bins.index(b)
            prev_fill = sum(fills[b - 1])
            assert prev_fill + tokens[first_idx] > budget


class TestMp4ParseProperties:
    """The test-grade encoder and the real parser are independent
    walks of the same ISO-BMFF spec — any random parameter draw must
    round-trip exactly, and any truncation must degrade to None (or
    a partial table), never an exception."""

    @given(
        st.integers(1, 40),                 # n_frames
        st.integers(1, 200),                # frame_delta
        st.integers(1, 8),                  # key_every
        st.integers(0, 2**31 - 1),          # size seed
        st.one_of(st.none(), st.integers(1, 7)),   # samples_per_chunk
        st.booleans(),                      # with ctts
    )
    @settings(max_examples=60, deadline=None)
    def test_encode_parse_round_trip(self, n, delta, ke, seed,
                                     spc, with_ctts):
        from ons_utils_spark.operators import multimodal as mm

        sizes = [1 + (seed + 37 * i) % 300 for i in range(n)]
        ct = ([((seed >> 3) + 13 * i) % 500 - 100 for i in range(n)]
              if with_ctts else None)
        payload = mm.encode_test_mp4(
            n, delta, ke, sizes, samples_per_chunk=spc,
            ctts_offsets=ct)
        meta = mm.decode_mp4_meta(payload)
        nk = (n + ke - 1) // ke
        assert (meta['n_frames'], meta['n_keyframes']) == (n, nk)
        assert meta['duration_ms'] == n * delta * 1000 // 600

        table = mm.mp4_sample_table(payload)
        assert len(table) == n
        # sizes and keyframe flags round-trip exactly
        assert [r[4] for r in table] == sizes
        assert [r[2] for r in table] == [i % ke == 0 for i in range(n)]
        # pts: dts plus the signed composition offset
        for i, r in enumerate(table):
            want = (i * delta + (ct[i] if ct else 0)) * 1000 // 600
            assert r[1] == want
        # offsets: chunk-contiguous, every byte of mdat accounted for
        spc_eff = spc or n
        offs = [r[3] for r in table]
        pos, si = offs[0], 0
        while si < n:
            take = min(spc_eff, n - si)
            for j in range(take):
                assert offs[si + j] == pos
                pos += sizes[si + j]
            si += take
        assert pos == len(payload)

    @given(st.integers(0, 2**31 - 1), st.integers(0, 2000))
    @settings(max_examples=60, deadline=None)
    def test_truncation_never_raises(self, seed, cut):
        from ons_utils_spark.operators import multimodal as mm

        n = 1 + seed % 12
        payload = mm.encode_test_mp4(
            n, 40, 2, [10 + (seed + i) % 50 for i in range(n)])
        prefix = payload[:min(cut, len(payload))]
        mm.decode_mp4_meta(prefix)       # None or partial — no raise
        mm.mp4_sample_table(prefix)

    @given(st.binary(max_size=400))
    @settings(max_examples=80, deadline=None)
    def test_arbitrary_bytes_never_raise(self, junk):
        from ons_utils_spark.operators import multimodal as mm

        mm.decode_mp4_meta(junk)   # the property IS "never raises"
        mm.mp4_sample_table(junk)  # (valid boxes from 400 random
        #                            bytes are astronomically rare,
        #                            so don't assert None-ness)

    @given(
        st.integers(0, 2**31 - 1),
        st.lists(st.tuples(st.integers(0, 900), st.integers(0, 255)),
                 min_size=1, max_size=8),
    )
    @settings(max_examples=120, deadline=None)
    def test_byte_corruption_never_raises(self, seed, flips):
        """Arbitrary byte corruptions of a VALID file — including
        count fields claiming billions of entries — must degrade to
        None / a partial table, never raise or allocate unboundedly."""
        from ons_utils_spark.operators import multimodal as mm

        n = 1 + seed % 10
        payload = bytearray(mm.encode_test_mp4(
            n, 40, 2, [10 + (seed + i) % 50 for i in range(n)]))
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = mm.mp4_sample_table(bytes(payload))
        assert out is None or len(out) <= len(payload)
        mm.decode_mp4_meta(bytes(payload))

    def test_hostile_count_fields_clamped(self):
        """Surgical corruption: overwrite stsz's count with 2^32-1 —
        the parse must clamp, not crash or allocate 4G entries."""
        import struct

        from ons_utils_spark.operators import multimodal as mm

        payload = bytearray(mm.encode_test_mp4(5, 40, 2, [32] * 5))
        i = bytes(payload).index(b'stsz')
        payload[i + 12:i + 16] = struct.pack('>I', 0xFFFFFFFF)
        out = mm.mp4_sample_table(bytes(payload))
        assert out is not None and len(out) <= 5
        i = bytes(payload).index(b'stts')
        payload[i + 8:i + 12] = struct.pack('>I', 0xFFFFFFFF)
        mm.mp4_sample_table(bytes(payload))
