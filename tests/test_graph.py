"""PageRank: pure-Python mirror, dangling/sink semantics, determinism."""

from embeddingsearch_spark.operators.graph import pagerank


def _mirror(edges, iters=3, d=0.85):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: 1.0 for v in nodes}
    for _ in range(iters):
        incoming = {v: 0.0 for v in nodes}
        for u, v in edges:
            incoming[v] += r[u] / deg[u]
        r = {v: (1 - d) + d * incoming[v] for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_matches_mirror(spark):
    # star + chain + sink: 1..4 -> 0 (authority), 0 -> 5 -> 6 (chain,
    # 6 is dangling)
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    want = _mirror(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # the authority out-ranks the pure-source leaves; the chain end
    # (dangling sink fed by the authority's whole mass) ranks highest
    assert got[0] > got[1]
    assert got[6] == max(got.values())


def test_pagerank_deterministic_and_sink_keeps_base(spark):
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    assert a == b
    # node 1 has no in-edges: rank settles at the base (1-d)
    assert a[1] == 0.15
