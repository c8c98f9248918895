#!/usr/bin/env python3
"""Cross-round bench regression diff (r11 verdict directive #4).

Usage: bench_diff.py <old BENCH_DETAIL_rN.json> <new BENCH_DETAIL_rM.json>
                     [jsonOut] [--gate]

Mechanizes what the r11 verdict computed by hand: reads two committed
per-query bench details and emits
  - the common-query-set total ratio (new/old, medians),
  - every query whose median moved >1.5x either way, with the per-run
    minima alongside the medians (the PLANS.md-recommended statistic for
    the iterative family, where a single polluted run drags the median
    but the min stays honest),
  - queries present in only one round (surface growth/shrink).

A mover whose MIN ratio is close to 1 while its MEDIAN ratio is large is
the host-noise signature (one slow run among three); a mover whose min
moved too AND whose per-run GC is flat is a real plan change — a mover
whose GC blew up alongside is JVM pressure, not a plan (r12 verdict:
gc_ms 10-40x on untouched queries). The gc-aware verdict column encodes
that triage; `--gate` (r12 directive #7) exits nonzero iff a >1.5x
regression carries the real-move verdict, so the end-of-round script
fails loudly on genuine plan regressions and stays quiet on noise.
Dev tooling only.
"""
import sys, json, re


def gc_med(gcs, q):
    g = gcs.get(q)
    return sorted(g)[len(g) // 2] if g else None


def load(path):
    """Accepts either a BENCH_DETAIL (queries+runs) file or the driver's
    BENCH_rN wrapper ({n, rc, sf, tail, parsed}) — the wrapper's `tail`
    embeds the bench JSON line, often TRUNCATED, so per-query medians are
    regex-recovered (only queries fully inside the tail survive; runs are
    absent, min falls back to median)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d.get("queries", {}), d.get("runs", {}), d.get("gc_ms", {})
    if d.get("parsed") and "queries" in d["parsed"]:
        p = d["parsed"]
        return p["queries"], p.get("runs", {}), p.get("gc_ms", {})
    tail = d.get("tail", "")
    med = {m.group(1): float(m.group(2)) for m in
           re.finditer(r'"([a-z0-9_]+)":([0-9.]+)', tail)
           if m.group(1) not in ("value", "sf", "n", "rc", "cpus",
                                 "queries_omitted")}
    if med:
        print(f"[note] {path}: driver wrapper with truncated tail — "
              f"recovered {len(med)} per-query medians, no runs")
    return med, {}, {}


def stats(med, runs, q):
    m = med[q]
    r = runs.get(q)
    mn = min(r) if r else m
    return m, mn


def main():
    args = [a for a in sys.argv[1:] if a != "--gate"]
    gate = "--gate" in sys.argv
    expect = None
    if "--expect" in args:
        i = args.index("--expect")
        expect = args[i + 1]
        del args[i:i + 2]
    old_p, new_p = args[0], args[1]
    omed, oruns, ogcs = load(old_p)
    nmed, nruns, ngcs = load(new_p)
    if expect:
        # same set-equality discipline as merge_gate_logs.py: the NEW
        # detail must bench exactly SparkEntry.queries (query_keys.json
        # from a graft.Verify dump at the same HEAD) — ends the r13/r14
        # drift where late-added queries silently missed BENCH_DETAIL
        with open(expect) as f:
            want = set(json.load(f))
        if set(nmed) != want:
            print(f"SET-EQUALITY FAIL vs {expect}: "
                  f"missing={sorted(want - set(nmed))} "
                  f"extra={sorted(set(nmed) - want)}", file=sys.stderr)
            sys.exit(2)
        print(f"set-equality OK: new detail benches all {len(want)} queries")
    common = sorted(set(omed) & set(nmed))
    only_old = sorted(set(omed) - set(nmed))
    only_new = sorted(set(nmed) - set(omed))

    o_tot = sum(omed[q] for q in common)
    n_tot = sum(nmed[q] for q in common)
    out = {
        "old": old_p, "new": new_p,
        "n_common": len(common),
        "common_total_old_s": round(o_tot, 2),
        "common_total_new_s": round(n_tot, 2),
        "common_total_ratio": round(n_tot / o_tot, 3) if o_tot else None,
        "only_in_old": only_old, "only_in_new": only_new,
        "movers": [],
    }
    print(f"common set: {len(common)} queries; total "
          f"{o_tot:.1f}s -> {n_tot:.1f}s ({out['common_total_ratio']}x)")
    if only_new:
        print(f"new-only ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"old-only ({len(only_old)}): {', '.join(only_old)}")

    movers = []
    for q in common:
        om, omin = stats(omed, oruns, q)
        nm, nmin = stats(nmed, nruns, q)
        ratio = nm / om if om else float("inf")
        if ratio > 1.5 or ratio < 1 / 1.5:
            min_ratio = nmin / omin if omin else float("inf")
            ogc, ngc = gc_med(ogcs, q), gc_med(ngcs, q)
            gc_ratio = (round((ngc + 1) / (ogc + 1), 2)
                        if ogc is not None and ngc is not None else None)
            # triage order: one slow run among three inflates the median
            # but not the min (host noise); GC blowing up alongside a
            # regression is JVM pressure, not a plan change; a regression
            # whose min moved on FLAT gc is the real thing
            if 1 / 1.3 <= min_ratio <= 1.3:
                verdict = "host-noise-pattern"
            elif ratio > 1.5 and gc_ratio is not None and gc_ratio >= 3:
                verdict = "jvm-pressure"
            else:
                verdict = "real-move"
            movers.append({
                "query": q, "median_ratio": round(ratio, 2),
                "old_median_s": round(om, 3), "new_median_s": round(nm, 3),
                "old_min_s": round(omin, 3), "new_min_s": round(nmin, 3),
                "min_ratio": round(min_ratio, 2),
                "old_gc_ms": ogc, "new_gc_ms": ngc, "gc_ratio": gc_ratio,
                "verdict": verdict,
            })
    movers.sort(key=lambda m: -m["median_ratio"])
    out["movers"] = movers
    if movers:
        print(f"\n{len(movers)} queries moved >1.5x (median), sorted worst first:")
        print(f"{'query':34s} {'med ratio':>9s} {'old med':>8s} {'new med':>8s}"
              f" {'old min':>8s} {'new min':>8s} {'min ratio':>9s}"
              f" {'gc ratio':>8s}  verdict")
        for m in movers:
            gcr = f"{m['gc_ratio']:.2f}" if m["gc_ratio"] is not None else "-"
            print(f"{m['query']:34s} {m['median_ratio']:>9.2f}"
                  f" {m['old_median_s']:>8.3f} {m['new_median_s']:>8.3f}"
                  f" {m['old_min_s']:>8.3f} {m['new_min_s']:>8.3f}"
                  f" {m['min_ratio']:>9.2f} {gcr:>8s}  {m['verdict']}")
    else:
        print("\nno query moved >1.5x in either direction")
    if len(args) > 2:
        with open(args[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"\nwrote {args[2]}")
    if gate:
        bad = [m for m in movers
               if m["median_ratio"] > 1.5 and m["verdict"] == "real-move"]
        if bad:
            print(f"\nGATE FAIL: {len(bad)} regression(s) with flat-GC "
                  f"real-move verdict: {', '.join(m['query'] for m in bad)}")
            sys.exit(1)
        print("\ngate: no flat-GC plan regressions")


if __name__ == "__main__":
    main()
