"""Property-based tests (hypothesis) for the pure-python kernels: digest
merge/error bounds, consensus arithmetic, gate order, and the portable hash
the Spark/DuckDB oracle parity rests on."""

import math

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from skyline_spark.config import EnsembleConfig
from skyline_spark.operators.digest import (
    bin_upper_edge,
    digest_quantile,
    digest_total,
    merge_digests,
)
from skyline_spark.operators.ensemble import consensus_anomalous, gate_status
from skyline_spark.plans.stats import DIGEST_BINS_PER_OCTAVE

K = DIGEST_BINS_PER_OCTAVE
REL = 2 ** (1 / K) - 1


def _digest_of(values):
    d = {}
    for v in values:
        b = int(math.floor(math.log2(v + 1.0) * K))
        d[b] = d.get(b, 0) + 1
    return d


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=300))
def test_digest_quantile_error_bound(values):
    d = _digest_of(values)
    assert digest_total(d) == len(values)
    for q in (0.1, 0.5, 0.9, 0.95):
        est = digest_quantile(d, q)
        # type-1 exact quantile
        s = sorted(values)
        exact = s[max(0, math.ceil(q * len(s)) - 1)]
        # estimate is the exclusive upper edge of the exact value's bin
        assert est > exact or (exact == 0 and est >= bin_upper_edge(0) - 1)
        assert est <= (exact + 1) * (1 + REL) + 1e-9

@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=100_000), max_size=200),
    st.lists(st.integers(min_value=0, max_value=100_000), max_size=200),
)
def test_digest_merge_is_exact(a, b):
    merged = merge_digests([_digest_of(a), _digest_of(b)])
    assert merged == _digest_of(a + b)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from([True, False, None]), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=12),
)
def test_consensus_matches_reference_formula(ensemble, k):
    """anomalous iff count(False) <= n - k (algorithms.py:679-687): None and
    True both count toward consensus."""
    expect = ensemble.count(False) <= len(ensemble) - k
    assert consensus_anomalous(ensemble, k) == expect


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=300),
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
    st.integers(min_value=0, max_value=10_000),
)
def test_gate_order_tooshort_stale_boring(n, const, staleness):
    """Gate precedence is TooShort → Stale → Boring (algorithms.py:583-593)."""
    cfg = EnsembleConfig(min_tolerable_length=50, stale_period=500)
    ts = np.arange(n, dtype=np.float64) * 60.0
    values = np.full(n, const)
    now = float(ts[-1]) + staleness
    got = gate_status(ts, values, now, cfg)
    if n < 50:
        assert got == "TOO_SHORT"
    elif staleness > 500:
        assert got == "STALE"
    else:
        assert got == "BORING"  # constant series


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
def test_h32_matches_duckdb(s):
    """The portable hash every dedup oracle rests on: python int(md5[:8],16)
    must equal DuckDB's ('0x' || substr(md5(x),1,8))::BIGINT for any ASCII
    string (the Spark side conv(substring(md5,1,8),16,10) is covered by the
    catalog parity tests)."""
    import hashlib

    py = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    dk = duckdb.sql(
        "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT", params=[s]
    ).fetchone()[0]
    assert py == dk


# ---------------------------------------------------------------------------
# RFC 9309 longest-match evaluation vs a pure-Python reference
# ---------------------------------------------------------------------------

_rule_prefix = st.text(alphabet="/ab1", min_size=1, max_size=4).map(
    lambda s: "/" + s.lstrip("/")
)
_path = st.text(alphabet="/ab1", min_size=1, max_size=6).map(
    lambda s: "/" + s.lstrip("/")
)


def _py_robots(path: str, rules: list[tuple[str, str]]) -> tuple[str, str]:
    """Reference RFC 9309 evaluator: longest matching prefix wins, allow
    beats disallow on an exact-length tie, no match -> allowed."""
    best = None  # (len, is_allow, kind, prefix)
    for kind, prefix in rules:
        if path.startswith(prefix):
            cand = (len(prefix), kind == "allow", kind, prefix)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    if best is None:
        return "allowed", ""
    return ("allowed" if best[1] else "blocked"), best[3]


@settings(max_examples=8, deadline=None)
@given(
    rules=st.lists(
        st.tuples(st.sampled_from(["allow", "disallow"]), _rule_prefix),
        min_size=0,
        max_size=6,
        unique=True,
    ),
    paths=st.lists(_path, min_size=1, max_size=10, unique=True),
)
def test_robots_eval_matches_python_reference(spark, rules, paths):
    from pyspark.sql import Row
    from skyline_spark.catalog.crawl_queries import evaluate_robots

    host = "h.example.org"
    parsed = spark.createDataFrame(
        [Row(url=f"https://{host}{p}", host=host, path=p) for p in paths],
        "url string, host string, path string",
    )
    rules_df = spark.createDataFrame(
        [Row(host=host, kind=k, prefix=p) for k, p in rules],
        "host string, kind string, prefix string",
    )
    got = {
        r.url: (r.verdict, r.matched_rule)
        for r in evaluate_robots(parsed, rules_df).collect()
    }
    for p in paths:
        want_verdict, want_rule = _py_robots(p, rules)
        url = f"https://{host}{p}"
        assert got[url][0] == want_verdict, (p, rules, got[url])
        # matched_rule ties between two same-length same-kind prefixes
        # cannot exist (prefixes are unique), so the rule is deterministic
        # except allow/disallow pairs of the same prefix string — unique
        # tuples still allow that pair; the verdict assert above covers it
        if got[url][0] == want_verdict == "blocked":
            assert got[url][1] == want_rule, (p, rules, got[url])


# ---------------------------------------------------------------------------
# round-4: media codec round-trip properties
# ---------------------------------------------------------------------------

@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """encode_bmp → decode_bmp is the identity for every (w, h) incl. all
    row-padding classes (3w % 4 ∈ {0,1,2,3})."""
    from skyline_spark.functions.media_codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(gray)), gray)


@given(
    n=st.integers(min_value=0, max_value=500),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_property(n, rate, seed):
    from skyline_spark.functions.media_codecs import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    r2, s2 = decode_wav(encode_wav(s, rate))
    assert r2 == rate and np.array_equal(s, s2)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    max_side=st.integers(min_value=1, max_value=48),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bmp_resize_property(w, h, max_side, seed):
    """Resize bounds: output dims ≤ max_side when shrinking, byte-identical
    passthrough when already within bounds, and every output pixel equals
    its integer-mapped source pixel."""
    from skyline_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_bmp_nearest,
    )

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = encode_bmp(gray)
    out, ow, oh = resize_bmp_nearest(payload, max_side)
    if max(w, h) <= max_side:
        assert out == payload and (ow, oh) == (w, h)
    else:
        assert 1 <= ow <= max_side and 1 <= oh <= max_side
        got = decode_bmp(out)
        xs = (np.arange(ow) * w) // ow
        ys = (np.arange(oh) * h) // oh
        assert np.array_equal(got, gray[np.ix_(ys, xs)])


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_nfc_clean_idempotent(s):
    """The NFC cleaning contract is idempotent — cleaning a cleaned string
    is a no-op (control strip, ws collapse, trim and NFC are each
    idempotent and the composition preserves it)."""
    import re
    import unicodedata

    ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    ws = re.compile(r"[ \t\n\r]+")

    def clean(t):
        return unicodedata.normalize("NFC", ws.sub(" ", ctrl.sub("", t)).strip(" "))

    assert clean(clean(s)) == clean(s)
