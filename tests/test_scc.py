"""SCC trim-settle vs a Python Tarjan oracle."""

import pandas as pd

from hope_graph_builder_spark.operators.graph import strongly_connected_components


def _tarjan(edges):
    from collections import defaultdict

    g = defaultdict(list)
    nodes = set()
    for a, b in edges:
        g[a].append(b)
        nodes.add(a)
        nodes.add(b)
    index = {}
    low = {}
    on = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v):
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on.add(node)
            recurse = False
            for i in range(pi, len(g[node])):
                w = g[node][i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if not recurse:
                if low[node] == index[node]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
                work.pop()
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[node])

    for v in list(nodes):
        if v not in index:
            strongconnect(v)
    return out


def test_scc_cases(spark):
    cases = [
        # two 3-cycles joined by a one-way bridge + a chain + isolate pair
        [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 12), (12, 10),
         (20, 21), (21, 22), (30, 31)],
        # pure chain (worst case for naive settle)
        [(i, i + 1) for i in range(1, 12)],
        # figure-eight: two cycles sharing a vertex → one SCC
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)],
    ]
    for pairs in cases:
        pdf = pd.DataFrame(pairs, columns=["src", "dst"])
        got = {
            r.id: r.component
            for r in strongly_connected_components(
                spark.createDataFrame(pdf), max_rounds=20
            ).collect()
        }
        assert got == _tarjan(pairs), pairs


def test_nonconvergence_fails_loudly(spark):
    """A path graph longer than max_iter must RAISE, not return wrong
    components silently."""
    import pytest as _pytest

    from hope_graph_builder_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=3)
    # and converges fine with enough rounds
    cc = connected_components(edges, max_iter=20)
    assert cc.select("component").distinct().count() == 1
