"""Greenwald-Khanna quantile sketch — the checkpoint's rank-error-bounded
mergeable digest.

north_star names "quantile sketches via t-digest/GK" for the checkpoint's
stat digests. The log-histogram digest (operators/digest.py) bounds
RELATIVE VALUE error (~9%); this GK sketch is the complementary guarantee —
bounded RANK error: any quantile read off a single sketch is within
``eps * n`` ranks of exact, and the sketch size is O((1/eps) * log(eps*n))
regardless of input size.

Published algorithm (Greenwald & Khanna, "Space-Efficient Online Computation
of Quantile Summaries", SIGMOD 2001; merge via rank bounds per Greenwald &
Khanna 2004 / Agarwal et al., "Mergeable Summaries", PODS 2012). Original
implementation — entries are (value, g, delta) with the classic invariant
``g + delta <= 2*eps*n``:

- ``rmin(i) = g_1 + ... + g_i`` and ``rmax(i) = rmin(i) + delta_i`` bracket
  the true rank of ``v_i``;
- construction here is BATCH (from a sorted value->count histogram), so
  entries start EXACT (delta=0) and compress() introduces the only
  uncertainty, keeping the invariant;
- merge() combines two sketches through explicit rank bounds: an entry's
  merged rmin/rmax add the tightest bounds the other sketch proves for its
  value. Rank error grows with merge depth (bounded by sum of the two
  sketches' errors per merge, logarithmic in practice for balanced trees);
  the property tests pin observed error <= 2*eps*n across random merge
  trees of up to 64 parts.

The sketch is JSON-serializable (``to_dict``/``from_dict``) and rides the
checkpoint's ``stat_digests`` blob next to the log-histogram
(plans/validate.py stage 7), so per-partition lineage rows merge into
exact-bounded corpus quantiles without re-touching data.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import Iterable, Mapping, Sequence

__all__ = ["GKSketch", "GK_DEFAULT_EPS"]

GK_DEFAULT_EPS = 0.01


@dataclass
class GKSketch:
    eps: float = GK_DEFAULT_EPS
    n: int = 0
    # parallel entry lists sorted by value: v[i] a sampled value, g[i] the
    # rank gap to the previous sample, d[i] (delta) the rank uncertainty
    v: list = field(default_factory=list)
    g: list = field(default_factory=list)
    d: list = field(default_factory=list)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_value_counts(
        cls,
        values: Sequence[float],
        counts: Sequence[int],
        eps: float = GK_DEFAULT_EPS,
    ) -> "GKSketch":
        """Build from a SORTED ascending (value, count) histogram — the
        shape the stats plan already aggregates for exact percentiles.
        Entries start exact (delta=0, g=count), then compress."""
        if len(values) != len(counts):
            raise ValueError("values/counts length mismatch")
        sk = cls(eps=eps)
        prev = None
        for val, cnt in zip(values, counts):
            val = float(val)
            cnt = int(cnt)
            if cnt <= 0:
                raise ValueError(f"non-positive count {cnt}")
            if prev is not None and val <= prev:
                raise ValueError("values must be strictly ascending")
            prev = val
            sk.v.append(val)
            sk.g.append(cnt)
            sk.d.append(0)
            sk.n += cnt
        sk.compress()
        return sk

    @classmethod
    def from_values(
        cls, values: Iterable[float], eps: float = GK_DEFAULT_EPS
    ) -> "GKSketch":
        """Convenience: histogram an unsorted iterable, then batch-build."""
        from collections import Counter

        c = Counter(float(x) for x in values)
        vals = sorted(c)
        return cls.from_value_counts(vals, [c[x] for x in vals], eps)

    # -- invariant ----------------------------------------------------------

    def _band_cap(self) -> int:
        """Max allowed g + delta: floor(2 * eps * n), never below 1."""
        return max(1, int(math.floor(2.0 * self.eps * self.n)))

    def compress(self) -> None:
        """Merge adjacent entries while the invariant holds. The first and
        last entries are never absorbed, so min/max stay exact."""
        if len(self.v) < 3:
            return
        cap = self._band_cap()
        nv, ng, nd = [self.v[0]], [self.g[0]], [self.d[0]]
        # walk middles; absorbing entry i into its successor keeps rmax of
        # the successor and folds i's g into it — sound because every value
        # summarized by entry i is <= v[i+1]
        pend_g = 0
        for i in range(1, len(self.v) - 1):
            if pend_g + self.g[i] + self.g[i + 1] + self.d[i + 1] <= cap:
                pend_g += self.g[i]
            else:
                nv.append(self.v[i])
                ng.append(pend_g + self.g[i])
                nd.append(self.d[i])
                pend_g = 0
        nv.append(self.v[-1])
        ng.append(pend_g + self.g[-1])
        nd.append(self.d[-1])
        self.v, self.g, self.d = nv, ng, nd

    # -- rank bounds --------------------------------------------------------

    def _rmin(self) -> list:
        out, c = [], 0
        for gi in self.g:
            c += gi
            out.append(c)
        return out

    def _bounds_for(self, x: float) -> tuple[int, int]:
        """(lower, upper) bound this sketch proves for the rank of value x
        within ITS OWN population — used by merge()."""
        if not self.v:
            return 0, 0
        rmin = self._rmin()
        # i = index of last sampled value <= x
        i = bisect.bisect_right(self.v, x) - 1
        if i < 0:
            return 0, 0
        lo = rmin[i]
        if self.v[i] == x:
            # x is sampled here: its own rank interval is the tight bound
            hi = rmin[i] + self.d[i]
        elif i + 1 < len(self.v):
            # anything above x is bracketed below the next sample's rmax - 1
            hi = rmin[i + 1] + self.d[i + 1] - 1
        else:
            hi = self.n
        return lo, max(lo, hi)

    # -- merge --------------------------------------------------------------

    def merge(self, other: "GKSketch") -> "GKSketch":
        """Pairwise convenience over :meth:`merge_many`. For merging MANY
        sketches (the checkpoint's partition→corpus rollup) call merge_many
        directly: its rank-error bound is 2*eps regardless of fan-in,
        whereas chaining pairwise merges compounds the bound per level."""
        return GKSketch.merge_many([self, other])

    @classmethod
    def merge_many(cls, sketches: Sequence["GKSketch"]) -> "GKSketch":
        """K-way combine via summed rank bounds: for each sampled value x in
        the union, the merged rank interval is the SUM over inputs of the
        tightest [lower, upper] each input proves for x. Each input's local
        slack is <= 2*eps*n_j, so the summed slack is <= 2*eps*n total —
        the merged error bound is 2*eps for ANY number of inputs. A g-only
        grid compaction afterwards bounds size at ~2/eps without touching
        the deltas, so the bound survives the shrink."""
        parts = [s for s in sketches if s.v]
        if not parts:
            eps = max((s.eps for s in sketches), default=GK_DEFAULT_EPS)
            return cls(eps=eps)
        if len(parts) == 1:
            s = parts[0]
            out = cls(eps=s.eps, n=s.n, v=list(s.v), g=list(s.g), d=list(s.d))
            out.compress()
            return out
        eps = max(s.eps for s in parts)
        n = sum(s.n for s in parts)
        rmins = [s._rmin() for s in parts]
        ents = []  # (value, rmin_merged, rmax_merged)
        for j, a in enumerate(parts):
            for i, val in enumerate(a.v):
                lo = rmins[j][i]
                hi = rmins[j][i] + a.d[i]
                for k, b in enumerate(parts):
                    if k == j:
                        continue
                    lo_o, hi_o = b._bounds_for(val)
                    lo += lo_o
                    hi += hi_o
                ents.append((val, lo, hi))
        ents.sort(key=lambda t: (t[0], t[1]))
        # collapse duplicate values (sampled by several inputs): keep the
        # tightest interval — every per-input bound is sound, so the
        # intersection is too
        ded: list[list] = []
        for val, lo, hi in ents:
            if ded and ded[-1][0] == val:
                ded[-1][1] = max(ded[-1][1], lo)
                ded[-1][2] = min(ded[-1][2], hi)
            else:
                ded.append([val, lo, hi])
        out = cls(eps=eps, n=n)
        prev_lo = 0
        for val, lo, hi in ded:
            lo = max(lo, prev_lo + 1)  # distinct values: ranks strictly rise
            hi = max(hi, lo)
            out.v.append(val)
            out.g.append(lo - prev_lo)
            out.d.append(hi - lo)
            prev_lo = lo
        # last sample is the true max of the union: pin its rank
        out.g[-1] += out.n - prev_lo
        out.d[-1] = 0
        out.compress()
        out._shrink_grid()
        return out

    def _shrink_grid(self, max_size_factor: float = 4.0) -> None:
        """Post-merge compaction when compress() can't shrink far enough
        (merge-grown deltas block the invariant-capped rule). Absorb on a
        g-ONLY cap: dropping a sample folds its g into the successor and
        leaves every surviving (rmin, rmax) bound untouched, so it is sound
        regardless of delta sizes, adds at most 2*eps*n to the lookup
        fallback's error (already its bound), and never grows a delta."""
        if len(self.v) <= max_size_factor / max(self.eps, 1e-9):
            return
        cap = self._band_cap()
        nv, ng, nd = [self.v[0]], [self.g[0]], [self.d[0]]
        pend_g = 0
        for i in range(1, len(self.v) - 1):
            if pend_g + self.g[i] + self.g[i + 1] <= cap:
                pend_g += self.g[i]
            else:
                nv.append(self.v[i])
                ng.append(pend_g + self.g[i])
                nd.append(self.d[i])
                pend_g = 0
        nv.append(self.v[-1])
        ng.append(pend_g + self.g[-1])
        nd.append(self.d[-1])
        self.v, self.g, self.d = nv, ng, nd

    # -- queries ------------------------------------------------------------

    def quantile(self, q: float) -> float:
        """Classic GK lookup for rank r = ceil(q*n): the first sample whose
        proven rank interval sits within e = eps*n of r (exists whenever the
        g+d invariant holds). Entries whose g exceeds the invariant cap are
        duplicate-heavy values folded at build time — for those the type-1
        fallback (first sample with rmax >= r) lands INSIDE the value's
        occupied rank range, so the duplicates don't cost accuracy."""
        if not self.v:
            return float("nan")
        if q <= 0.0:
            return self.v[0]  # min is exact: never absorbed by compress
        if q >= 1.0:
            return self.v[-1]  # max likewise
        r = max(1, int(math.ceil(q * self.n)))
        e = max(1, int(math.floor(self.eps * self.n)))
        rmin = self._rmin()
        for i in range(len(self.v)):
            lo, hi = rmin[i], rmin[i] + self.d[i]
            if r - lo <= e and hi - r <= e:
                return self.v[i]
        for i in range(len(self.v)):
            if rmin[i] + self.d[i] >= r:
                return self.v[i]
        return self.v[-1]

    @property
    def size(self) -> int:
        return len(self.v)

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "eps": self.eps,
            "n": self.n,
            "v": list(self.v),
            "g": list(self.g),
            "d": list(self.d),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "GKSketch":
        return cls(
            eps=float(d["eps"]),
            n=int(d["n"]),
            v=[float(x) for x in d["v"]],
            g=[int(x) for x in d["g"]],
            d=[int(x) for x in d["d"]],
        )
