"""A12: the reference's pairwise information-transfer metric, re-implemented
exactly (not the earlier bin-overlap proxy).

Semantics transcribed from the reference (all paths under
/root/reference/src/main/scala/twitter/crawler/metrics/):

* ``calculate_it``      — JoinedProcesses.scala:49-66 ``calculateIT``:
  conditional-entropy difference H(last-bin | main-bins) −
  H(last-bin | main+additional bins) over dwell-weighted bin-occupancy
  distributions.  NOTE: the reference computes ``singleBias``/``joinedBias``
  (JoinedProcesses.scala:45-47,58,61) but its return expression drops them —
  Scala returns the last expression, ``singleConditionalEntropy -
  joinedConditionalEntropy`` (line 62-65).  We match that exactly and expose
  ``bias`` separately.
* ``_BinSeq``           — BinSequence.scala:6-38: a train of contiguous bins of
  widths ``intervals`` sliding over [begin, end); ``count`` marks bins holding
  ≥1 point (Bin.scala:8-20 ``check``: last point in [start, end)), ``min_move``
  is the smallest shift that changes any bin's state (Bin.scala:27-40
  ``moveToChange``), clipped to the remaining distance + 1 with the
  ``finished`` flag (BinSequence.scala:22-32 ``minMove``).
* ``_entropy``          — Distribution.scala:22-29: log2(total) − Σ c·log2(c)/total.
* bin widths            — package.scala:11-12: INTERVALS = [12h, 2h, 10m, 1s]
  for the main (to) process, ADDITIONAL_INTERVALS = [12h, 2h, 10m] for the
  additional (from) process; main bins are index-shifted by
  len(ADDITIONAL_INTERVALS) (JoinedProcesses.scala:23,27).
* min-activity filter   — package.scala:26 ``createGraph`` only pairs series
  with ≥ 10 points; both directions (direct + reverse) are computed per pair
  (package.scala:29-31).

The sweep is inherently sequential per pair (each dwell distance depends on
the current bin positions), so it runs inside a grouped-Arrow
``applyInPandas`` batch — one pair per group, pairs parallel across tasks.
Bitsets are plain ints (bit i set ⇔ bin i on), dwell weights are exact ints.
"""

from __future__ import annotations

from bisect import bisect_left
from math import log, log2

# package.scala:7-12 (seconds)
INTERVALS_IT = (43200, 7200, 600, 1)
ADDITIONAL_INTERVALS_IT = (43200, 7200, 600)
MIN_POINTS_IT = 10  # package.scala:26
_INF = 1 << 62


class _BinSeq:
    """BinSequence.scala:6-38 over a sorted, deduplicated point list."""

    __slots__ = ("starts", "ends", "end", "n", "on_ts", "finished")

    def __init__(self, start: int, end: int, intervals) -> None:
        bounds = [start]
        for iv in intervals:
            bounds.append(bounds[-1] + iv)
        self.starts = bounds[:-1]
        self.ends = bounds[1:]
        self.end = end
        self.n = len(intervals)
        self.on_ts = [-1] * self.n
        self.finished = False

    def count(self, pts, shift: int = 0) -> int:
        """Bitset of on bins; remembers each bin's last on-timestamp
        (Bin.scala:8-20 ``check``: last point in [start, end))."""
        bits = 0
        for i in range(self.n):
            j = bisect_left(pts, self.ends[i]) - 1  # last point < end_i
            if j >= 0 and pts[j] >= self.starts[i]:
                self.on_ts[i] = pts[j]
                bits |= 1 << (i + shift)
            else:
                self.on_ts[i] = -1
        return bits

    def min_move(self, pts) -> int:
        """Smallest shift changing any bin's state (Bin.scala:27-40), clipped
        per BinSequence.scala:22-32 (sets ``finished``)."""
        potential = _INF
        for i in range(self.n):
            if self.on_ts[i] > 0:  # Bin.scala:7 isOn: onTimestamp > 0
                mv = self.on_ts[i] - self.starts[i] + 1
            else:
                j = bisect_left(pts, self.ends[i])  # first point >= end_i
                mv = pts[j] - self.ends[i] + 1 if j < len(pts) else _INF
            if mv < potential:
                potential = mv
        remaining = self.end - self.ends[-1]
        if potential > remaining:
            self.finished = True
            return remaining + 1
        return potential

    def move(self, d: int) -> None:
        self.starts = [s + d for s in self.starts]
        self.ends = [e + d for e in self.ends]


def _entropy(counters: dict) -> float:
    """Distribution.scala:22-29."""
    total = sum(counters.values())
    partial = sum(c * log2(c) for c in counters.values())
    return log2(total) - partial / total


def _drop_last(counters: dict, last_bit: int) -> dict:
    """Distribution.merge with ``dropLast`` (JoinedProcesses.scala:53-56)."""
    out: dict = {}
    for key, c in counters.items():
        k = key & ~last_bit
        out[k] = out.get(k, 0) + c
    return out


def bias(total: int, length: int) -> float:
    """JoinedProcesses.scala:45-47 — computed by the reference per direction
    but NOT applied to its return value (dead vals at lines 58, 61); exposed
    for parity/testing only."""
    return ((1 << (length - 1)) - 1) / (2.0 * total * log(2))


def calculate_it(from_pts, to_pts) -> float:
    """IT(from → to), JoinedProcesses.scala:49-66.

    ``from_pts``/``to_pts``: sorted, deduplicated int epoch-second lists
    (the SortedSet[Long] inputs). Returns
    singleConditionalEntropy − joinedConditionalEntropy.
    """
    begin = min(to_pts[0], from_pts[0])  # borders(): JoinedProcesses.scala:39-43
    end = to_pts[-1] + 1
    if end - begin < sum(INTERVALS_IT):
        # Span shorter than the bin train: the Scala sweep would increment
        # distributions with non-positive dwell weights and return NaN via
        # log of a non-positive count. Make the degenerate case explicit.
        return float("nan")
    main = _BinSeq(begin, end, INTERVALS_IT)
    addl = _BinSeq(begin, end, ADDITIONAL_INTERVALS_IT)
    shift = len(ADDITIONAL_INTERVALS_IT)

    single: dict = {}
    joined: dict = {}
    # joinedDistribution sweep, JoinedProcesses.scala:21-35. Only the MAIN
    # sequence's finished flag terminates (line 25); both min_moves run each
    # iteration and may clip independently — replicated exactly.
    while not main.finished:
        aset = addl.count(from_pts)
        mset = main.count(to_pts, shift)
        d = addl.min_move(from_pts)
        dm = main.min_move(to_pts)
        if dm < d:
            d = dm
        key = aset | mset
        joined[key] = joined.get(key, 0) + d
        single[mset] = single.get(mset, 0) + d
        main.move(d)
        addl.move(d)

    last_bit = 1 << (len(INTERVALS_IT) + shift - 1)  # JoinedProcesses.scala:52
    single_ce = _entropy(single) - _entropy(_drop_last(single, last_bit))
    joined_ce = _entropy(joined) - _entropy(_drop_last(joined, last_bit))
    return single_ce - joined_ce
