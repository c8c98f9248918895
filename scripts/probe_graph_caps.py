#!/usr/bin/env python3
"""Convergence probes sizing the bounded-iteration caps (r12 evidence).

Usage: probe_graph_caps.py [sfDir ...]   (default: all three testdata sfs)

Recomputes, on the driver's committed parquet and in plain Python, the
two schedules whose caps the engine enforces with convergence-or-throw:

- sccAll's trim-to-directed-core peel: rounds to the count-equality
  fixpoint (the last round is the no-op detector), with the edge-count
  trace per round;
- sccLayers' longest-path level propagation over the SCC condensation:
  the DAG's max level (= rounds to the fixpoint; detection lands one
  round later), plus quotient size.

The 10x soak graph is ten disjoint suffix-tagged copies of the sf0.1
graph (Soak.scala), so both schedules there equal sf0.1's by
construction — no separate probe needed. Results are committed in
PLANS.md ("sccAll trim-cap and sccLayers level-cap evidence"). Dev
tooling only; not part of the library.
"""
import sys
from collections import deque

import duckdb


def edges_of(sf_dir):
    con = duckdb.connect()
    return con.execute(f"""
      SELECT DISTINCT CAST(l_orderkey AS VARCHAR) src,
             CAST(l_partkey AS VARCHAR) dst
      FROM read_parquet('{sf_dir}/lineitem.parquet')
      WHERE l_orderkey <> l_partkey""").fetchall()


def trim_probe(sf_dir):
    e = set(edges_of(sf_dir))
    rounds, sizes = 0, [len(e)]
    while True:
        keep = {s for s, _ in e} & {d for _, d in e}
        ne = {(s, d) for s, d in e if s in keep and d in keep}
        rounds += 1
        sizes.append(len(ne))
        if len(ne) == len(e):
            break
        e = ne
    print(f"{sf_dir}: trim fixpoint after {rounds} rounds "
          f"(last is the no-op detector); edge sizes {sizes}")


def tarjan_sccs(edges):
    adj, nodes = {}, set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index, low, on, stack, sccs, cnt = {}, {}, set(), [], {}, [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = cnt[0]
                cnt[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            ns = adj.get(v, [])
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    sccs[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return sccs


def level_probe(sf_dir):
    edges = edges_of(sf_dir)
    sccs = tarjan_sccs(edges)
    ce = {(sccs[s], sccs[d]) for s, d in edges if sccs[s] != sccs[d]}
    cnodes = set(sccs.values())
    indeg = {n: 0 for n in cnodes}
    cadj = {}
    for a, b in ce:
        indeg[b] += 1
        cadj.setdefault(a, []).append(b)
    level = {n: 0 for n in cnodes}
    q = deque(n for n in cnodes if indeg[n] == 0)
    peeled = 0
    while q:
        v = q.popleft()
        peeled += 1
        for w in cadj.get(v, []):
            level[w] = max(level[w], level[v] + 1)
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    assert peeled == len(cnodes), "quotient not acyclic"
    print(f"{sf_dir}: max level {max(level.values())} over {len(cnodes)} "
          f"SCCs / {len(ce)} quotient edges "
          f"(detection lands at round max_level + 1)")


def truss_probe(sf_dir, k=3):
    """kTruss's edge peel: rounds to the count-equality fixpoint (the
    engine's converged-detection round), with the edge-count trace.
    Support = common-neighbor count of the edge's endpoints."""
    raw = edges_of(sf_dir)
    e = {(min(s, d), max(s, d)) for s, d in raw}
    sizes = [len(e)]
    rounds = 0
    while True:
        nbr = {}
        for a, b in e:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        ne = {(a, b) for a, b in e if len(nbr[a] & nbr[b]) >= k - 2}
        rounds += 1
        sizes.append(len(ne))
        if len(ne) == len(e):
            break
        e = ne
    print(f"{sf_dir}: k-truss(k={k}) fixpoint after {rounds} rounds "
          f"(last is the no-op detector); edge sizes {sizes}")


def main():
    sfs = sys.argv[1:] or [f"/root/testdata/sf{s}"
                           for s in ("0.001", "0.01", "0.1")]
    for sf in sfs:
        trim_probe(sf)
    for sf in sfs:
        level_probe(sf)
    for sf in sfs:
        truss_probe(sf)


if __name__ == "__main__":
    main()
