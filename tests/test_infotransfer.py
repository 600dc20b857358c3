"""Pin ops/infotransfer.py (the production bisect/bitmask sweep) against an
independent, literal object-per-bin transcription of the reference Scala
(metrics/Bin.scala, BinSequence.scala, Distribution.scala,
JoinedProcesses.scala) plus hand-checked micro cases.

The twin below deliberately uses a different representation (one object per
bin, linear scans instead of bisect, frozenset bitsets instead of int masks)
so a transcription mistake in either implementation breaks the comparison.
"""

from __future__ import annotations

import math
import random

import pytest

from twitter_crawler_spark.ops.infotransfer import (
    ADDITIONAL_INTERVALS_IT,
    INTERVALS_IT,
    _BinSeq,
    _entropy,
    bias,
    calculate_it,
)

# ---------------------------------------------------------------------------
# twin: literal Scala transcription
# ---------------------------------------------------------------------------

INF = 1 << 62


class TwinBin:
    """Bin.scala:5-42, one object per bin, linear scans."""

    def __init__(self, start, end):
        self.start, self.end = start, end
        self.on_timestamp = -1

    def check(self, history):
        in_range = [t for t in history if self.start <= t < self.end]
        if not in_range:
            self.on_timestamp = -1
            return False
        self.on_timestamp = in_range[-1]
        return True

    def move(self, d):
        self.start += d
        self.end += d

    def move_to_change(self, history):
        if self.on_timestamp > 0:
            return self.on_timestamp - self.start + 1
        after = [t for t in history if t >= self.end]
        return (after[0] - self.end + 1) if after else INF


class TwinBinSequence:
    """BinSequence.scala:6-38."""

    def __init__(self, start, end, intervals):
        bounds = [start]
        for iv in intervals:
            bounds.append(bounds[-1] + iv)
        self.bins = [TwinBin(bounds[i], bounds[i + 1]) for i in range(len(intervals))]
        self.last_bin = self.bins[-1]
        self.end = end
        self.finished = False

    def count(self, history, shift=0):
        return frozenset(i + shift for i, b in enumerate(self.bins) if b.check(history))

    def min_move(self, history):
        potential = min(b.move_to_change(history) for b in self.bins)
        if potential > self.end - self.last_bin.end:
            self.finished = True
            return self.end - self.last_bin.end + 1
        return potential

    def move(self, d):
        for b in self.bins:
            b.move(d)


def twin_entropy(counters):
    total = sum(counters.values())
    return math.log2(total) - sum(c * math.log2(c) for c in counters.values()) / total


def twin_calculate_it(from_pts, to_pts):
    """JoinedProcesses.scala:20-35 sweep + :49-66 conditional entropies."""
    begin = min(to_pts[0], from_pts[0])
    end = to_pts[-1] + 1
    main = TwinBinSequence(begin, end, INTERVALS_IT)
    addl = TwinBinSequence(begin, end, ADDITIONAL_INTERVALS_IT)
    shift = len(ADDITIONAL_INTERVALS_IT)
    single, joined = {}, {}
    while not main.finished:
        aset = addl.count(from_pts)
        mset = main.count(to_pts, shift)
        d = min(addl.min_move(from_pts), main.min_move(to_pts))
        joined[aset | mset] = joined.get(aset | mset, 0) + d
        single[mset] = single.get(mset, 0) + d
        main.move(d)
        addl.move(d)
    last = len(INTERVALS_IT) + shift - 1
    drop = lambda c: _merge(c, last)  # noqa: E731
    single_ce = twin_entropy(single) - twin_entropy(drop(single))
    joined_ce = twin_entropy(joined) - twin_entropy(drop(joined))
    return single_ce - joined_ce


def _merge(counters, last):
    out = {}
    for k, c in counters.items():
        nk = frozenset(k - {last})
        out[nk] = out.get(nk, 0) + c
    return out


# ---------------------------------------------------------------------------
# randomized twin comparison
# ---------------------------------------------------------------------------


def _series(rng, n, span, base=1_700_000_000):
    # pin both endpoints so the pair's span always exceeds the bin-train
    # width (sum(INTERVALS_IT) = 51001s) — the non-degenerate regime
    pts = {base, base + span}
    pts.update(base + rng.randrange(span) for _ in range(n))
    return sorted(pts)


@pytest.mark.parametrize("seed", range(12))
def test_twin_matches_production(seed):
    rng = random.Random(seed)
    # vary density regimes: dense bursts over ~17h up to multi-week sparse
    span = rng.choice([60_000, 200_000, 5 * 86400, 30 * 86400])
    a = _series(rng, rng.randrange(10, 60), span)
    b = _series(rng, rng.randrange(10, 60), span)
    assert calculate_it(a, b) == pytest.approx(twin_calculate_it(a, b), abs=1e-12)
    assert calculate_it(b, a) == pytest.approx(twin_calculate_it(b, a), abs=1e-12)


def test_deterministic():
    rng = random.Random(99)
    a, b = _series(rng, 30, 100_000), _series(rng, 30, 100_000)
    assert calculate_it(a, b) == calculate_it(list(a), list(b))


# ---------------------------------------------------------------------------
# hand-checked micro cases
# ---------------------------------------------------------------------------


def test_binseq_count_and_minmove_hand():
    # bins of widths (10, 5) anchored at 100: [100,110), [110,115); end=130
    seq = _BinSeq(100, 130, (10, 5))
    pts = [103, 107, 111]
    assert seq.count(pts) == 0b11  # both on
    # on-bin moves: bin0 last-on 107 -> 107-100+1=8; bin1 last-on 111 -> 111-110+1=2
    assert seq.min_move(pts) == 2
    seq.move(2)  # bins now [102,112), [112,117)
    assert seq.count(pts) == 0b01  # 111 < 112: only bin0 on (103,107,111)
    # bin0: 111-102+1=10; bin1 off: first pt >= 117 none -> INF;
    # remaining = 130-117=13 >= 10 -> returns 10
    assert seq.min_move(pts) == 10


def test_binseq_finish_clip():
    seq = _BinSeq(0, 18, (10, 5))  # bins [0,10),[10,15), global end 18
    pts = [100]  # nothing in range; next change at 100-15+1=86 > 18-15=3
    assert seq.count(pts) == 0
    assert seq.min_move(pts) == 4  # remaining(3) + 1
    assert seq.finished


def test_entropy_hand():
    # counts {2, 2}: H = log2(4) - (2*1 + 2*1)/4 = 2 - 1 = 1
    assert _entropy({frozenset([0]): 2, frozenset([1]): 2}) == pytest.approx(1.0)
    # single key -> 0 bits
    assert _entropy({frozenset(): 7}) == pytest.approx(0.0)


def test_bias_formula():
    # ((1 << (length-1)) - 1) / (2 * total * ln 2), JoinedProcesses.scala:45-47
    assert bias(100, 4) == pytest.approx(7 / (200 * math.log(2)))
    assert bias(50, 7) == pytest.approx(63 / (100 * math.log(2)))


def test_identical_series_transfer_nonnegative_and_symmetric():
    rng = random.Random(7)
    a = _series(rng, 40, 80_000)
    assert calculate_it(a, a) == pytest.approx(twin_calculate_it(a, a), abs=1e-12)


def test_degenerate_span_is_nan():
    # span below the bin-train width (51001s): explicit NaN, not bogus math
    a = [1_700_000_000 + i * 60 for i in range(20)]
    assert math.isnan(calculate_it(a, a))


# ---------------------------------------------------------------------------
# relational oracle (SQL_INFO_TRANSFER) vs the sequential sweep
# ---------------------------------------------------------------------------


def test_sql_oracle_matches_sweep():
    """The driver-facing DuckDB oracle reformulates the dwell sweep as
    interval-union + delta-sweep SQL (closed-form domain [0, span-W]); pin it
    against calculate_it on synthetic series covering the NaN (span<W),
    boundary (span==W: m=0, single dwell unit) and min-points-drop cases."""
    import duckdb

    from twitter_crawler_spark.ops.analytics import SQL_INFO_TRANSFER

    rng = random.Random(5)
    base = 1_700_000_000
    # per-user raw spans; direction span = to_span + 1 (shared base anchor):
    # 40_000 → NaN into that user; 51_000 → exactly W (m=0 boundary)
    spans = {1: 40_000, 2: 51_000, 3: 60_000, 4: 400_000, 5: 200_000, 6: 3 * 86400}
    series, rows = {}, []
    for uid, span in spans.items():
        pts = sorted({base, base + span} | {base + rng.randrange(span) for _ in range(25)})
        series[uid] = pts
        rows += [(uid, t) for t in pts]
    # user 7: below the 10-point minimum → its pairs must be dropped entirely
    series[7] = [base + i * 1000 for i in range(5)]
    rows += [(7, t) for t in series[7]]

    con = duckdb.connect()
    con.execute("CREATE TABLE raw(user_id BIGINT, tsl BIGINT)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", rows)
    con.execute("CREATE VIEW events AS SELECT user_id, to_timestamp(tsl) AS ts FROM raw")
    got = con.execute(SQL_INFO_TRANSFER).fetchdf()

    eligible = [u for u in sorted(series) if len(series[u]) >= 10]
    expected = [(a, b) for a in eligible for b in eligible if a < b]
    assert list(zip(got["user_a"], got["user_b"])) == expected
    for row in got.itertuples(index=False):
        a, b = series[int(row.user_a)], series[int(row.user_b)]
        assert row.n_a == len(a) and row.n_b == len(b)
        for col, frm, to in (("it_ab", a, b), ("it_ba", b, a)):
            want = calculate_it(frm, to)
            have = getattr(row, col)
            if math.isnan(want):
                assert math.isnan(have), (row.user_a, row.user_b, col)
            else:
                assert have == pytest.approx(round(want, 6), abs=1e-9), (
                    row.user_a, row.user_b, col)
