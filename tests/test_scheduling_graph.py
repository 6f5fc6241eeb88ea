"""Unit tests for HITS and the crawl-scheduling operators — hand-sized
graphs/frontiers where the exact-integer contracts (max-normalized
PPM scores, Σ alloc == budget, deterministic tie-breaks) can be
checked against pencil-and-paper values."""

import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import graph as G
from ai_log_analyzer_spark.functions import scheduling as SCH


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_hits_two_hubs_one_authority(spark):
    # 1→3, 2→3: nodes 1,2 are the only (equal) hubs, 3 the only
    # authority; max-normalization pins all at exactly PPM
    out = {r.node: (r.hub_ppm, r.auth_ppm)
           for r in G.hits(_edges(spark, [(1, 3), (2, 3)]), iters=2).collect()}
    assert out == {1: (G.PPM, 0), 2: (G.PPM, 0), 3: (0, G.PPM)}


def test_hits_hub_prefers_node_linking_better_authorities(spark):
    # 3 and 4 both get inlinks from {1,2} → equal authorities; node 1
    # links both, node 2 links one → hub(1) = 2·hub(2) after scaling
    out = {r.node: (r.hub_ppm, r.auth_ppm)
           for r in G.hits(_edges(spark, [(1, 3), (1, 4), (2, 3)]),
                           iters=2).collect()}
    assert out[1][0] == G.PPM
    assert out[3][1] == G.PPM          # 3 has the larger inflow
    assert 0 < out[2][0] < out[1][0]
    assert 0 < out[4][1] < out[3][1]


def test_hits_matches_oracle_sql_on_random_graph(spark):
    import duckdb
    pairs = [((i * 37) % 23, (i * 53 + 7) % 23) for i in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {r.node: (r.hub_ppm, r.auth_ppm)
           for r in G.hits(_edges(spark, pairs), iters=3).collect()}
    edges_cte = " UNION ALL ".join(
        f"SELECT {a}::BIGINT AS src, {b}::BIGINT AS dst" for a, b in pairs)
    want = {int(r[0]): (int(r[1]), int(r[2])) for r in duckdb.sql(
        "WITH " + G.hits_sql(edges_cte, iters=3)).fetchall()}
    assert got == want


def test_hits_scale_div_parity(spark):
    # the DECIMAL(38,0) `div` lane must floor exactly like DuckDB's
    # HUGEINT `//` on non-negative operands (the overflow-safe scale
    # step both engines share)
    import duckdb
    got = spark.sql(
        "SELECT (CAST(7999999 AS DECIMAL(38,0)) * 1000000) div 3000000"
    ).collect()[0][0]
    want = duckdb.sql(
        "SELECT (7999999::HUGEINT * 1000000) // 3000000").fetchone()[0]
    assert int(got) == int(want) == 2666666


def _weights(spark, rows):
    return spark.createDataFrame(rows, "domain long, weight long")


def test_budget_apportion_hand_case(spark):
    # weights 5,3,2 over budget 10 → exact shares 5,3,2 (no remainder)
    out = {r.domain: r.alloc for r in SCH.budget_apportion(
        _weights(spark, [(1, 5), (2, 3), (3, 2)]), budget=10).collect()}
    assert out == {1: 5, 2: 3, 3: 2}


def test_budget_apportion_remainder_tiebreak_domain_asc(spark):
    # equal weights, budget 10 over 3 domains: base 3 each, leftover 1
    # goes to the LOWEST domain id (rem ties break domain asc)
    rows = SCH.budget_apportion(
        _weights(spark, [(7, 4), (3, 4), (5, 4)]), budget=10).collect()
    out = {r.domain: (r.base_alloc, r.extra, r.alloc) for r in rows}
    assert out == {3: (3, 1, 4), 5: (3, 0, 3), 7: (3, 0, 3)}
    assert sum(r.alloc for r in rows) == 10


def test_budget_apportion_sum_invariant_and_zero_weight_excluded(spark):
    rows = [(d, (d * 13) % 7) for d in range(50)]     # some weights 0
    out = SCH.budget_apportion(_weights(spark, rows), budget=12345).collect()
    assert sum(r.alloc for r in out) == 12345
    assert {r.domain for r in out} == {d for d, w in rows if w > 0}
    # proportionality: alloc within 1 of the exact real share
    tot = sum(w for _, w in rows if w > 0)
    for r in out:
        exact = 12345 * dict(rows)[r.domain] / tot
        assert abs(r.alloc - exact) < 1.0


def test_budget_apportion_duplicate_domain_rows_presum(spark):
    # two rows for domain 1 must pre-aggregate, not apportion twice
    out = {r.domain: r.weight for r in SCH.budget_apportion(
        _weights(spark, [(1, 2), (1, 3), (2, 5)]), budget=10).collect()}
    assert out == {1: 5, 2: 5}


def test_frontier_waves_hand_case(spark):
    urls = spark.createDataFrame(
        [("u/a", 1, 9), ("u/b", 1, 9), ("u/c", 1, 5), ("u/d", 2, 1)],
        "url string, domain long, priority long")
    out = {r.url: (r.position, r.wave)
           for r in SCH.frontier_waves(urls, concurrency=2).collect()}
    # domain 1: priority 9 ties break url asc → a, b then c
    assert out == {"u/a": (0, 0), "u/b": (1, 0), "u/c": (2, 1),
                   "u/d": (0, 0)}


def test_frontier_waves_rejects_bad_concurrency(spark):
    urls = spark.createDataFrame(
        [("u", 1, 1)], "url string, domain long, priority long")
    with pytest.raises(ValueError):
        SCH.frontier_waves(urls, concurrency=0)


# --- bfs_depths (functions/graph.py) ----------------------------------------


def test_bfs_depths_hand_graph(spark):
    # 0 -> 1 -> 2 -> 3 (chain), 0 -> 2 (shortcut), 9 isolated source
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (9, 8)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.depth for r in G.bfs_depths(edges, seeds).collect()}
    # shortcut wins: 2 is depth 1, not 2; 8/9 unreachable -> absent
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_depths_multi_seed_min_and_cap(spark):
    # two seeds, chain 0->1->2->3->4->5->6->7; cap at 3 hops
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (5,)], ["node"])
    got = {r.node: r.depth
           for r in G.bfs_depths(edges, seeds, max_depth=3).collect()}
    # 4 is unreachable within the cap going 0->..., but NOT seeded;
    # 6/7 take their depth from the nearer seed 5
    assert got == {0: 0, 5: 0, 1: 1, 6: 1, 2: 2, 7: 2, 3: 3}


def test_bfs_depths_early_stop_on_empty_frontier(spark):
    # frontier empties after round 1; rounds 2..6 must not run any jobs
    # that change the result, and seeds-only graphs settle at depth 0
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (1,)], ["node"])
    got = {r.node: r.depth
           for r in G.bfs_depths(edges, seeds, max_depth=6).collect()}
    assert got == {0: 0, 1: 0}


# --- label_propagation (functions/graph.py) ----------------------------------


def test_lpa_two_cliques_with_bridge(spark):
    # cliques {0,1,2} and {10,11,12} joined by one bridge 2-10:
    # 3 rounds settle each clique on its min label
    cl = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    edges = spark.createDataFrame(cl, ["src", "dst"])
    got = {r.node: r.community
           for r in G.label_propagation(edges, iters=3).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12]
    assert got[10] != got[0]


def test_lpa_mode_tie_breaks_to_smallest_label(spark):
    # node 5's neighbors 1 and 2 each contribute one label -> tie ->
    # smallest label wins in round 1
    edges = spark.createDataFrame([(1, 5), (2, 5)], ["src", "dst"])
    got = {r.node: r.community
           for r in G.label_propagation(edges, iters=1).collect()}
    assert got[5] == 1


def test_lpa_symmetrizes_and_dedups_edges(spark):
    # duplicated directed edges must not double-weight the mode:
    # node 5 sees {1 (x3 duplicated), 2, 2'} -> labels 1:1 vote, 2:1 vote
    # after dedup? No: neighbors are 1 and 2 -> tie -> 1.  With multi-
    # edge counting, 1 would win 3:1 — same answer; so pin the reverse
    # direction instead: 5 also propagates INTO 1 and 2
    edges = spark.createDataFrame([(1, 5), (1, 5), (1, 5), (2, 5)],
                                  ["src", "dst"])
    got = {r.node: r.community
           for r in G.label_propagation(edges, iters=1).collect()}
    assert got[5] == 1
    assert got[1] == 5 and got[2] == 5  # their only neighbor is 5


# --- kcore_peel (functions/graph.py) -----------------------------------------


def test_kcore_triangle_survives_pendants_peel(spark):
    # triangle {0,1,2} (2-core) with pendant chain 2-3-4: k=2 peels 4,
    # then 3; the triangle keeps degree 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], ["src", "dst"])
    got = {r.node: r.degree for r in G.kcore_peel(edges, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    # chain 0-1-2-3 + triangle on 3,4,5: each chain node peels one
    # round after its neighbor — 3 rounds to reach the fixpoint
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (3, 5)], ["src", "dst"])
    got = {r.node: r.degree for r in G.kcore_peel(edges, k=2).collect()}
    assert set(got) == {3, 4, 5} and all(v == 2 for v in got.values())


def test_kcore_empty_result_when_no_core(spark):
    # a tree has no 2-core at all
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    assert G.kcore_peel(edges, k=2).count() == 0


# --- randomized invariants for the round-5 graph additions -------------------


def _random_edges(seed, n_nodes=40, n_edges=70):
    import random
    rng = random.Random(seed)
    return [(rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)]


def test_bfs_matches_networkx_free_reference(spark):
    """BFS depths must equal a driver-side Dijkstra-free reference
    (plain BFS over the adjacency dict) on a random graph."""
    edges = _random_edges(11)
    seeds = [0, 7]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    from collections import deque
    ref, q = {s: 0 for s in seeds}, deque(seeds)
    while q:
        u = q.popleft()
        if ref[u] >= 6:
            continue
        for v in adj.get(u, ()):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    got = {r.node: r.depth for r in G.bfs_depths(
        spark.createDataFrame(edges, ["src", "dst"]),
        spark.createDataFrame([(s,) for s in seeds], ["node"]),
        max_depth=6).collect()}
    assert got == ref


def _ref_peel(edges, k, max_rounds):
    """Driver-side reference: symmetrize, then round-limited peel."""
    E = {(s, d) for s, d in edges if s != d} \
        | {(d, s) for s, d in edges if s != d}
    for _ in range(max_rounds):
        deg = {}
        for s, _d in E:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        E2 = {(s, d) for s, d in E if s in keep and d in keep}
        if E2 == E:
            break
        E = E2
    out = {}
    for s, _d in E:
        out[s] = out.get(s, 0) + 1
    return out


def test_kcore_matches_reference_peel(spark):
    """The fixed-round peel must match a driver-side reference at the
    SAME round budget (seed 23 needs 9 waves — the graph that exposed
    the old 8-round default), and a converged run is the true k-core:
    every survivor keeps degree ≥ k."""
    edges = _random_edges(23)
    df = spark.createDataFrame(edges, ["src", "dst"])
    # tight budget: unconverged, but bit-identical to the reference
    got8 = {r.node: r.degree
            for r in G.kcore_peel(df, k=3, max_rounds=8).collect()}
    assert got8 == _ref_peel(edges, 3, 8)
    # generous budget: fixpoint — all degrees ≥ k (empty 3-core here)
    got = {r.node: r.degree for r in G.kcore_peel(df, k=3).collect()}
    assert got == _ref_peel(edges, 3, 40)
    assert all(v >= 3 for v in got.values())


def test_lpa_communities_are_member_node_ids(spark):
    """Every LPA community id is itself a node id of the graph, and
    every node of the symmetrized graph gets exactly one row."""
    edges = _random_edges(31)
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = G.label_propagation(df, iters=3).collect()
    nodes = {s for s, d in edges if s != d} | {d for s, d in edges if s != d}
    got = {r.node for r in rows}
    assert got == nodes and len(rows) == len(nodes)
    assert {r.community for r in rows} <= nodes


# --- triangle_stats (functions/graph.py) --------------------------------------


def test_triangles_k4_all_fully_clustered(spark):
    # K4: every node has degree 3, sits in 3 triangles, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r.node: r for r in G.triangle_stats(
        spark.createDataFrame(k4, ["src", "dst"])).collect()}
    assert len(got) == 4
    for r in got.values():
        assert (r.degree, r.n_triangles, r.clustering_ppm) == (3, 3, 1000000)


def test_triangles_pendant_and_star(spark):
    # triangle {0,1,2} with pendant 3 off node 2; star 10-{11,12,13}
    edges = [(0, 1), (1, 2), (0, 2), (2, 3),
             (10, 11), (10, 12), (10, 13)]
    got = {r.node: r for r in G.triangle_stats(
        spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got[0].n_triangles == got[1].n_triangles == got[2].n_triangles == 1
    assert got[0].clustering_ppm == 1000000          # deg 2: 2·1/(2·1)
    assert got[2].clustering_ppm == 333333           # deg 3: 2·1/(3·2)
    assert got[3].n_triangles == 0 and got[3].clustering_ppm == 0
    for star_node in (10, 11, 12, 13):
        assert got[star_node].n_triangles == 0


def test_triangles_match_brute_force_on_random_graph(spark):
    edges = _random_edges(43)
    sym = {(s, d) for s, d in edges if s != d} \
        | {(d, s) for s, d in edges if s != d}
    adj = {}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    ref = {}
    for n, nbrs in adj.items():
        t = sum(1 for a in nbrs for b in nbrs
                if a < b and b in adj.get(a, ()))
        ref[n] = (len(nbrs), t)
    got = {r.node: (r.degree, r.n_triangles) for r in G.triangle_stats(
        spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got == ref


# --- trustrank (functions/graph.py) -------------------------------------------


def _trustrank_ref(edges, seeds, iters=3):
    PPB, NUM, DEN = 10**9, 850, 1000
    nodes = {s for s, d in edges} | {d for s, d in edges}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: (PPB if n in seeds else 0) for n in nodes}
    floor = PPB * (DEN - NUM) // DEN
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {n: (floor if n in seeds else 0) + NUM * inflow[n] // DEN
             for n in nodes}
    return r


def test_trustrank_matches_reference_on_random_graph(spark):
    import random
    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    seeds = [0, 3, 9]
    got = {r.node: r.trust_ppb for r in G.trustrank(
        _edges(spark, edges),
        spark.createDataFrame([(s,) for s in seeds], "node long")).collect()}
    assert got == _trustrank_ref(edges, set(seeds))


def test_trustrank_all_seeds_equals_pagerank(spark):
    import random
    rng = random.Random(6)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
    df = _edges(spark, edges)
    nodes = df.select(F.col("src").alias("node")).unionAll(
        df.select(F.col("dst").alias("node"))).distinct()
    tr = {r.node: r.trust_ppb for r in G.trustrank(df, nodes).collect()}
    pr = {r.node: r.rank_ppb for r in G.pagerank(df).collect()}
    assert tr == pr


def test_trustrank_spam_farm_stays_cold(spark):
    # seed 0 -> 1 -> 2 chain; spam farm {10,11,12} densely self-linked
    # with NO path from the seed: farm trust must be exactly the 0 base
    edges = [(0, 1), (1, 2),
             (10, 11), (11, 12), (12, 10), (10, 12), (12, 11), (11, 10)]
    got = {r.node: r.trust_ppb for r in G.trustrank(
        _edges(spark, edges),
        spark.createDataFrame([(0,)], "node long"), iters=3).collect()}
    assert got[1] > got[2] > 0
    assert got[10] == got[11] == got[12] == 0
    assert got[0] > got[1]   # seed keeps the teleport floor


# --- hyperball / HyperANF (functions/graph.py) ---------------------------------


def _hb_ref(members):
    """HLL m=16 insert + estimate mirror of graph.hyperball's contract:
    returns (n_reg_set, ball_estimate) for an exact ball member set."""
    import hashlib
    import math
    regs = [0] * G.HB_M
    for n in members:
        h = int(hashlib.md5(f"{n}|hb".encode()).hexdigest()[:8], 16)
        j, w = h % G.HB_M, h // G.HB_M
        rho = (G.HB_WBITS + 1) if w == 0 else \
            (G.HB_WBITS + 1) - len(format(w, "b"))
        regs[j] = max(regs[j], rho)
    z = regs.count(0)
    s = sum(2 ** (32 - r) for r in regs)
    raw = G.HB_ALPHA * G.HB_M * G.HB_M * float(1 << 32) / s
    est = G.HB_M * math.log(G.HB_M / z) if (raw < 2.5 * G.HB_M and z > 0) \
        else raw
    return G.HB_M - z, est


def _ball(adj, n, t):
    cur, seen = {n}, {n}
    for _ in range(t):
        nxt = set()
        for v in cur:
            nxt |= adj.get(v, set())
        nxt -= seen
        seen |= nxt
        cur = nxt
    return seen


def test_hyperball_registers_equal_exact_ball_inserts(spark):
    # after t max-merge rounds every node's counter must equal the HLL
    # of its EXACT t-ball (max-merge is lossless for HLL) — an exact
    # equality test of the distributed merge, not a tolerance test
    import random
    rng = random.Random(11)
    edges = list({(rng.randrange(25), rng.randrange(25))
                  for _ in range(50)})
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    got = {r.node: (r.n_reg_set, r.ball_estimate)
           for r in G.hyperball(_edges(spark, edges), iters=2).collect()}
    assert set(got) == nodes
    for n in nodes:
        n_set, est = _hb_ref(_ball(adj, n, 2))
        assert got[n][0] == n_set
        assert got[n][1] == pytest.approx(est, abs=1e-4)


def test_hyperball_chain_tail_sees_only_itself(spark):
    # 0 -> 1 -> 2 -> 3: after any rounds, node 3's ball is {3}; node 0
    # after 3 rounds holds all 4 nodes, so its estimate is >= node 3's
    got = {r.node: (r.n_reg_set, r.ball_estimate) for r in G.hyperball(
        _edges(spark, [(0, 1), (1, 2), (2, 3)]), iters=3).collect()}
    assert got[3] == (1, pytest.approx(_hb_ref({3})[1], abs=1e-4))
    assert got[0][1] >= got[3][1]
    assert got[0][0] == _hb_ref({0, 1, 2, 3})[0]


def test_hyperball_estimates_monotone_in_iters(spark):
    import random
    rng = random.Random(12)
    edges = list({(rng.randrange(15), rng.randrange(15))
                  for _ in range(30)})
    df = _edges(spark, edges)
    e1 = {r.node: r.ball_estimate for r in G.hyperball(df, iters=1).collect()}
    e3 = {r.node: r.ball_estimate for r in G.hyperball(df, iters=3).collect()}
    assert all(e3[n] >= e1[n] - 1e-9 for n in e1)


# --- harmonic centrality (functions/graph.py) -----------------------------------


def _inball(radj, n, t):
    cur, seen = {n}, {n}
    for _ in range(t):
        nxt = set()
        for v in cur:
            nxt |= radj.get(v, set())
        nxt -= seen
        seen |= nxt
        cur = nxt
    return seen


def _hb_raw(members):
    import hashlib
    import math
    regs = [0] * G.HB_M
    for n in members:
        h = int(hashlib.md5(f"{n}|hb".encode()).hexdigest()[:8], 16)
        j, w = h % G.HB_M, h // G.HB_M
        rho = (G.HB_WBITS + 1) if w == 0 else \
            (G.HB_WBITS + 1) - len(format(w, "b"))
        regs[j] = max(regs[j], rho)
    z = regs.count(0)
    s = sum(2 ** (32 - r) for r in regs)
    raw = G.HB_ALPHA * G.HB_M * G.HB_M * float(1 << 32) / s
    return G.HB_M * math.log(G.HB_M / z) if (raw < 2.5 * G.HB_M and z > 0) \
        else raw


def test_harmonic_matches_exact_inball_mirror(spark):
    import random
    rng = random.Random(13)
    edges = list({(rng.randrange(25), rng.randrange(25))
                  for _ in range(50)})
    radj = {}
    for s, d in edges:
        radj.setdefault(d, set()).add(s)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    got = {r.node: (r.harmonic_est, r.reach_estimate)
           for r in G.harmonic_centrality(
               _edges(spark, edges), iters=3).collect()}
    assert set(got) == nodes
    for n in nodes:
        e = [_hb_raw(_inball(radj, n, t)) for t in range(4)]
        harm = ((e[1] - e[0]) / 1.0 + (e[2] - e[1]) / 2.0) \
            + (e[3] - e[2]) / 3.0
        assert got[n][0] == pytest.approx(harm, abs=1e-4)
        assert got[n][1] == pytest.approx(e[3], abs=1e-4)


def test_harmonic_isolated_sink_outranks_source(spark):
    # star INTO node 0 (1..6 -> 0): node 0 is reachable from all six in
    # one hop (high harmonic); the leaves are reached by nobody, so
    # their in-ball never grows and their centrality is ~0
    edges = [(i, 0) for i in range(1, 7)]
    got = {r.node: r.harmonic_est for r in G.harmonic_centrality(
        _edges(spark, edges), iters=2).collect()}
    assert got[0] > 3.0
    for i in range(1, 7):
        assert abs(got[i]) < 1e-6
