"""Property-based invariants for the round-8 operators: the PNG codec
(pure Python — generous example counts), and the entity-resolution /
k-core operators against plain-Python reference implementations
(Spark-backed — modest example counts, each example is a full job)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_collector_spark.operators import codecs

# ------------------------------------------------------------ PNG codec


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_png_round_trip_any_raster_any_filter(w, h, ft, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(w * h, 3), dtype=np.uint16).astype(np.uint8)
    decoded = codecs.decode_png(codecs.encode_png(w, h, px, filter_type=ft))
    assert decoded is not None
    assert decoded[:2] == (w, h)
    assert np.array_equal(decoded[2], px)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_png_decoder_never_crashes_on_garbage(data):
    # arbitrary bytes (with and without a valid signature prefix) must
    # decode to None or a valid raster — never raise
    for payload in (data, codecs._PNG_SIG + data):
        out = codecs.decode_png(payload)
        assert out is None or (
            len(out) == 3 and out[2].shape == (out[0] * out[1], 3)
        )


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_sniff_format_total_and_stable(data):
    kind = codecs.sniff_format(data)
    assert kind in (None, "ppm", "png", "jpeg", "wav", "flac", "ogg", "mp3")
    assert codecs.sniff_format(data) == kind


# ------------------------------- entity resolution vs union-find reference


def _uf_reference(rows, keys):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for rid, _ in rows:
        parent[rid] = rid
    for ki in range(len(keys)):
        by_key = {}
        for rid, kv in rows:
            v = kv[ki]
            if v is not None:
                by_key.setdefault(v, []).append(rid)
        for members in by_key.values():
            for m in members[1:]:
                union(members[0], m)
    return {rid: find(rid) for rid, _ in rows}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 4)),  # phone bucket
            st.one_of(st.none(), st.integers(0, 4)),  # name bucket
        ),
        min_size=1,
        max_size=14,
    )
)
def test_resolve_entities_matches_union_find(spark, rows):
    from database_collector_spark.operators import entity

    recs = [
        (i, None if p is None else f"p{p}", None if n is None else f"n{n}")
        for i, (p, n) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        recs, "record_id long, phone_n string, name_n string"
    )
    got = {
        r["record_id"]: r["entity_id"]
        for r in entity.resolve_entities(
            df, keys=("phone_n", "name_n")
        ).collect()
    }
    ref_rows = [(i, (p, n)) for i, (p, n) in enumerate(
        ((r[1], r[2]) for r in recs)
    )]
    want = _uf_reference(ref_rows, keys=(0, 1))
    assert got == want


# ------------------------------------- k-core peel vs sequential reference


def _peel_reference(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    rounds = {}
    r = 0
    while True:
        r += 1
        drop = {
            v for v in alive if sum(1 for u in adj[v] if u in alive) < k
        }
        if not drop:
            break
        for v in drop:
            rounds[v] = r
        alive -= drop
    for v in alive:
        rounds[v] = None
    return rounds


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(1, 4),
)
def test_kcore_peel_matches_sequential_reference(spark, edges, k):
    from database_collector_spark.operators.graph import kcore_peel

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    df = spark.createDataFrame(clean, "src long, dst long")
    got = {r["node"]: r["peel_round"] for r in kcore_peel(df, k=k).collect()}
    assert got == _peel_reference(clean, k)
