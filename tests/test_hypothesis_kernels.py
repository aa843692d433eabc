"""Property-based tests (hypothesis) for the pure scalar/vector kernels
— no Ray in the loop, so hundreds of generated cases run in seconds.
Each property is the kernel's documented contract, checked against a
naive reimplementation or an algebraic invariant."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ophois_ray import cells, geo
from ophois_ray.graphops import _pack_edge, pairs_within_runs
from ophois_ray.sampling import _skyline2d_kernel, split_hash
from ophois_ray.textstats import doc_ngrams, flatten_tokens

ids31 = st.integers(min_value=0, max_value=(1 << 31) - 1)


@given(st.lists(st.tuples(st.integers(0, (1 << 29) - 1),
                          st.integers(0, (1 << 29) - 1),
                          st.integers(0, 20)), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_cells_encode_decode_roundtrip(items):
    ix = np.array([i[0] for i in items], dtype=np.int64)
    iy = np.array([i[1] for i in items], dtype=np.int64)
    res = np.array([i[2] for i in items], dtype=np.int64)
    c = cells.encode(res, ix, iy)
    r2, x2, y2 = cells.decode(c)
    assert (r2 == res).all() and (x2 == ix).all() and (y2 == iy).all()


@given(st.lists(st.tuples(
    st.floats(-89.999, 89.999, allow_nan=False),
    st.floats(-179.999, 179.999, allow_nan=False),
    st.integers(0, 12)), min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_cell_of_center_stays_in_cell(items):
    lat = np.array([i[0] for i in items])
    lon = np.array([i[1] for i in items])
    for r in {i[2] for i in items}:
        c = cells.cell_of(lat, lon, int(r))
        # the center of the assigned cell re-assigns to the same cell
        cla, clo = cells.cell_center(c)
        assert (cells.cell_of(cla, clo, int(r)) == c).all()


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_float_repr_roundtrips(x):
    assert float(geo.float_repr(x)) == x


@given(st.lists(st.tuples(ids31, ids31), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_pack_edge_is_injective(pairs):
    u = np.array([p[0] for p in pairs], dtype=np.int64)
    v = np.array([p[1] for p in pairs], dtype=np.int64)
    packed = _pack_edge(u, v)
    back = {(int(k) >> 31, int(k) & ((1 << 31) - 1)) for k in packed}
    assert back == {(int(a), int(b)) for a, b in zip(u, v)}


@given(st.lists(ids31, min_size=0, max_size=100))
@settings(max_examples=200, deadline=None)
def test_split_hash_range_and_determinism(keys):
    k = np.array(keys, dtype=np.int64)
    h1, h2 = split_hash(k), split_hash(k)
    assert (h1 == h2).all()
    if len(k):
        assert int(h1.min()) >= 0 and int(h1.max()) < (1 << 61) - 1
        # pure function of the key: equal keys hash equal
        exp = (k.astype(object) * 1103515245 + 12345) % ((1 << 61) - 1)
        assert (h1 == np.array(exp, dtype=np.int64)).all()


@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
                min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_skyline_kernel_matches_brute(points):
    x = np.array([p[0] for p in points], dtype=np.int64)
    y = np.array([p[1] for p in points], dtype=np.int64)
    keep = _skyline2d_kernel(x, y)
    for i in range(len(x)):
        dominated = bool(np.any(
            (x <= x[i]) & (y <= y[i]) & ((x < x[i]) | (y < y[i]))))
        assert keep[i] == (not dominated)


@given(st.lists(st.text(alphabet="ab x", min_size=0, max_size=20),
                min_size=0, max_size=15),
       st.integers(2, 4))
@settings(max_examples=300, deadline=None)
def test_doc_ngrams_matches_naive(texts, n):
    flat, doc_of, ndocs = flatten_tokens(texts)
    grams, gdoc = doc_ngrams(flat, doc_of, n)
    got = {}
    for g, d in zip(grams, gdoc):
        got.setdefault(int(d), []).append(g)
    for d, t in enumerate(texts):
        w = t.split()
        exp = [" ".join(w[j:j + n]) for j in range(len(w) - n + 1)]
        assert got.get(d, []) == exp


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000)),
                min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_pairs_within_runs_matches_naive(rows):
    rows = sorted(rows)
    grp = np.array([r[0] for r in rows], dtype=np.int64)
    val = np.array([r[1] for r in rows], dtype=np.int64)
    out = pairs_within_runs(grp, val)
    got = sorted(zip(out["u"].tolist(), out["v"].tolist()))
    exp = sorted(
        (int(val[i]), int(val[j]))
        for i in range(len(rows)) for j in range(i + 1, len(rows))
        if grp[i] == grp[j]
    )
    assert got == exp


_URL_CHARS = st.text(
    alphabet="abcz019./?&=#_-%", min_size=0, max_size=30)


@given(host=st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
       tail=_URL_CHARS,
       scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
@settings(max_examples=200, deadline=None)
def test_normalize_url_idempotent(host, tail, scheme):
    from ophois_ray.pages import normalize_url

    u = f"{scheme}://{host}/{tail}"
    once = normalize_url(u)
    if once is None:
        return
    again = normalize_url(once)
    assert again == once  # canonical form is a fixpoint


@given(st.text(alphabet="abc .@019-<>EMAILPHONE", max_size=80))
@settings(max_examples=200, deadline=None)
def test_pii_scrub_is_a_fixpoint(text):
    import re as _re

    from ophois_ray.textstats import PII_PATTERNS

    scrubbed = text
    for _, pat, mask in PII_PATTERNS:
        scrubbed = _re.sub(pat, mask, scrubbed)
    for _, pat, _mask in PII_PATTERNS:
        assert _re.search(pat, scrubbed) is None


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 100)),
                min_size=3, max_size=8),
       st.integers(0, 80), st.integers(0, 80),
       st.integers(1, 40), st.integers(1, 40))
@settings(max_examples=200, deadline=None)
def test_sutherland_hodgman_rect_window_properties(pts, cx, cy, w, h):
    """Clipping any SIMPLE polygon (S-H's contract — generated points
    are deduped and angularly sorted into a star-shaped ring) by a
    rectangle window: |area| never exceeds the window area or the
    subject's bbox area, and a window containing the subject's bbox
    leaves the shoelace magnitude unchanged."""
    import math

    from ophois_ray.polygons import _shoelace2, sutherland_hodgman

    pts = sorted(set(pts))
    if len(pts) < 3:
        return
    mx = sum(p[0] for p in pts) / len(pts)
    my = sum(p[1] for p in pts) / len(pts)
    pts = sorted(pts, key=lambda p: math.atan2(p[1] - my, p[0] - mx))
    win = [(cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h)]
    out = sutherland_hodgman(pts, win)
    a = abs(_shoelace2(out)) if out else 0.0
    assert a <= 2 * w * h + 1e-6
    xs = [p[0] for p in pts]; ys = [p[1] for p in pts]
    bbox2 = 2 * (max(xs) - min(xs)) * (max(ys) - min(ys))
    assert a <= bbox2 + 1e-6
    big = [(-1, -1), (101, -1), (101, 101), (-1, 101)]
    assert abs(abs(_shoelace2(sutherland_hodgman(pts, big)))
               - abs(_shoelace2(pts))) < 1e-6


@given(st.lists(st.integers(0, (1 << 40)), min_size=1, max_size=300,
                unique=True),
       st.integers(1, 12))
@settings(max_examples=100, deadline=None)
def test_rendezvous_minimal_disruption_property(keys, n):
    """HRW invariant for ANY key set and shard count: growing n -> n+1
    only ever moves keys TO the new shard."""
    from ophois_ray.sampling import rendezvous_shard

    k = np.array(keys, dtype=np.int64)
    a = rendezvous_shard(k, n)
    b = rendezvous_shard(k, n + 1)
    moved = a != b
    assert (b[moved] == n).all()
    assert (a < n).all() and (b <= n).all()


@given(st.lists(st.integers(0, 16), min_size=1, max_size=200),
       st.integers(1, 5000))
@settings(max_examples=100, deadline=None)
def test_apportion_remainder_invariants(groups, total):
    """Hamilton apportionment: slots sum to total and each group gets
    floor or ceil of its exact proportional share."""
    import pandas as pd

    counts = pd.Series(groups).value_counts().sort_index()
    n = counts.to_numpy(np.int64)
    N = int(n.sum())
    quota = (total * n) // N
    rem = (total * n) % N
    k = int(total - quota.sum())
    slots = quota.copy()
    if k > 0:
        order = np.argsort(-rem, kind="stable")
        slots[order[:k]] += 1
    assert slots.sum() == total
    assert ((slots == quota) | (slots == quota + 1)).all()
