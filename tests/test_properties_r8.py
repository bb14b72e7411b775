"""Round-8 property tests: randomized inputs against independent
models for the star-contraction helpers and the FastCDC chunker."""

import random

import pytest


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_star_contraction_equals_union_find_on_random_graphs(spark, seed):
    """_large_star/_small_star on RANDOM graphs (not just the chain
    feed the gated entry uses): alternating rounds must converge to
    stars whose roots are the component minima, for any edge set —
    compared against an independent union-find. Also pins the safety
    invariant the paper proves: no round ever MERGES two distinct
    components or SPLITS one (checked at every round, not just at the
    fixpoint)."""
    import pyspark.sql.functions as F

    from greenplum_cdc_spark.operators.dedup import (
        _large_star,
        _small_star,
    )

    rng = random.Random(seed)
    n = 40
    nodes = list(range(1, n + 1))
    edges = []
    # a mix: random sparse edges + one long path + isolated nodes
    for _ in range(25):
        a, b = rng.sample(nodes[: n - 10], 2)
        edges.append((a, b))
    path = nodes[n - 10 : n - 3]  # 7-node path; nodes[n-3:] stay isolated
    edges += list(zip(path, path[1:]))

    # independent union-find truth
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_root = {v: find(v) for v in nodes}

    def components_of(edge_rows, universe):
        p = {v: v for v in universe}

        def f(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for a, b in edge_rows:
            ra, rb = f(a), f(b)
            if ra != rb:
                p[max(ra, rb)] = min(ra, rb)
        return {v: f(v) for v in universe}

    cur = spark.createDataFrame(edges, "src long, dst long")
    baseline = components_of(edges, nodes)
    for _round in range(30):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        rows = [(r["src"], r["dst"]) for r in cur.collect()]
        # safety: same partition of the touched universe every round
        touched = {v for e in rows for v in e}
        comp_now = components_of(rows, nodes)
        for v in touched:
            assert comp_now[v] == baseline[v], (v, _round)
        srcs = {a for a, _b in rows}
        if not any(b in srcs for _a, b in rows):  # star fixpoint
            break
    else:
        pytest.fail("no convergence in 30 rounds")
    got = dict(rows)
    for v in nodes:
        root = want_root[v]
        if v == root:
            assert v not in got  # roots carry no outgoing edge
        else:
            assert got[v] == root, v


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_fastcdc_random_text_invariants(seed):
    """FastCDC on random text: chunks concatenate back to the
    original (byte conservation), every non-final chunk length lies
    in [MIN, MAX], chunking is deterministic, and appending a suffix
    never changes any chunk that ends at least MAX chars before the
    old end (streaming-append stability — the property chunk stores
    rely on to upload only the tail)."""
    from greenplum_cdc_spark.operators.text import (
        _FCDC_MAX,
        _FCDC_MIN,
        _fastcdc_bounds_py,
    )

    rng = random.Random(seed)
    alphabet = "abcdefgh XYZ0123"
    text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1500, 4000)))

    def chunks(t):
        bs = _fastcdc_bounds_py(t)
        ends = bs if (bs and bs[-1] == len(t)) else bs + [len(t)]
        out, s = [], 0
        for e in ends:
            out.append(t[s:e])
            s = e
        return out

    cs = chunks(text)
    assert "".join(cs) == text
    assert cs == chunks(text)  # deterministic
    for c in cs[:-1]:
        assert _FCDC_MIN <= len(c) <= _FCDC_MAX
    assert len(cs[-1]) <= _FCDC_MAX

    # append-only stability: old chunks ending > MAX before the old
    # end are byte-identical after the append (the final partial chunk
    # and anything within one MAX window of the end may reshape)
    appended = text + "".join(rng.choice(alphabet) for _ in range(500))
    cs2 = chunks(appended)
    stable_prefix_end = len(text) - _FCDC_MAX
    pos = 0
    for a, b in zip(cs, cs2):
        if pos + len(a) > stable_prefix_end:
            break
        assert a == b, pos
        pos += len(a)
