#!/usr/bin/env python3
"""Bench regression gate: compare a fresh graft.Bench JSON line against a
baseline (BENCH_r02.json wrapper or a raw bench line) query by query.

Usage: tools/bench_gate.py <new_bench.json> [baseline.json=BENCH_r02.json]

Flags a query when it is BOTH >2x its baseline AND >0.5 s absolute (small
queries live in scheduling noise). New queries (absent from the baseline)
are listed informationally. Exit code 1 if any regression or failed query.
"""
import json
import re
import sys


def reconstruct(text):
    """Rebuild a bench dict from a PARTIAL tail whose '{"metric"' prefix was
    truncated by the driver's stdout capture window (BENCH_r03.json): scrape
    the per-query name:seconds pairs and the failed list directly."""
    pairs = re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)":\s*([0-9]+\.[0-9]+)', text)
    # "value" is the total; "n"/"sec" are the omitted_fast rollup fields a
    # budget-shrunk line carries, not query names
    queries = {k: float(v) for k, v in pairs if k not in ("value", "n", "sec")}
    if not queries:
        return None
    failed = []
    mf = re.search(r'"failed":\[([^\]]*)\]', text)
    if mf:
        failed = re.findall(r'"([^"]+)"', mf.group(1))
    mv = re.search(r'"value":([0-9]+\.[0-9]+)', text)
    value = float(mv.group(1)) if mv else sum(queries.values())
    note = None if mv else "total reconstructed from partial tail"
    return {"metric": "total", "value": value, "unit": "sec",
            "queries": queries, "failed": failed, "note": note}


def load_bench(path):
    text = open(path).read()
    # accept: the raw one-line bench JSON (possibly sbt-prefixed), the
    # driver's wrapper (prefer its "parsed" field, else the line embedded in
    # "tail"), or — last resort — a truncated tail, reconstructed pair by
    # pair
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        parsed = obj.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return parsed
        tail = obj.get("tail", "")
        m = re.search(r'\{"metric"[^\n]*\}', tail)
        if m:
            return json.loads(m.group(0))
        rec = reconstruct(tail)
        if rec:
            return rec
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if m:
        return json.loads(m.group(0))
    rec = reconstruct(text)
    if rec:
        return rec
    raise SystemExit(f"no bench JSON found in {path}")


# Known-deliberate slowdowns, with the reason on record:
#  - custom_publish_roundtrip: since round 3 it ALWAYS republishes instead
#    of trusting a cross-version /tmp cache (round 2's only red
#    correctness cell was a suspected stale-cache hash mismatch); ~2 s of
#    write per run bought determinism of the correctness gate.
#  - text_bpe_learn: 0.34→1.13 s in r13 because the in-artifact BPE
#    training contract (SURVEY §2 #160, bpeLearnChecked) re-verifies
#    every learned merge against a distributed pair recount — the cell
#    now PROVES each merge was the argmax instead of asserting it.
# (dedup_embedding was allow-listed in r8 while it ran the saturated
# oracle config; since r9 that config lives under its own name,
# dedup_embedding_oracle, and dedup_embedding is back to the
# production-shaped LSH — directly comparable to r02 again.)
ALLOWED = {"custom_publish_roundtrip", "text_bpe_learn"}

# Queries that read a publishOnce-built /tmp scratch dataset: in a COLD
# sandbox, whichever of these ran first used to be charged the one-time
# dataset construction (r05: fetch_filter_in 42.4s for a 0.7s query).
# Bench now warms every query untimed before the timed loop, but old
# artifacts (and any future harness regression) show the signature:
# the top inflated queries are all scratch-dataset first-touchers.
FIRST_TOUCHERS = {
    "fetch_filter_eq", "fetch_filter_neq", "fetch_filter_gt", "fetch_filter_gte",
    "fetch_filter_lt", "fetch_filter_lte", "fetch_filter_in", "fetch_filter_multi",
    "fetch_diff", "fetch_diff_reverse", "fetch_latest_partition",
    "get_all_partition_values", "get_diff_partition_values",
    "get_max_partition_value", "get_all_files_list", "partition_types_roundtrip",
    "fetch_indexed_filter", "fetch_indexed_combined", "fetch_indexed_string",
    "zorder_publish_roundtrip", "publish_catalog_ddl", "publish_fetch_roundtrip",
    "q1_agg",
}


def main():
    new_path = sys.argv[1]
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r02.json"
    new, base = load_bench(new_path), load_bench(base_path)
    nq, bq = new["queries"], base["queries"]

    # Since r15 the bench stamps a pre-Spark CPU calibration: "calib" is
    # always present, "contended":true when it blew its budget. A contended
    # artifact is untrustworthy regardless of per-query comparisons — exit 1
    # immediately (r14: a contended run doubled every cell and was committed
    # unremarked; the judge caught it, the gate should have).
    if new.get("contended"):
        print(f"CONTENDED ARTIFACT: calibration {new.get('calib')}s blew its "
              f"budget — this bench ran on a loaded box; per-query times are "
              f"meaningless. Re-run on a quiet machine.")
        sys.exit(1)
    if "calib" in new:
        print(f"calibration {new['calib']}s (quiet box)")

    # Min-of-N artifacts compared against single-pass baselines read as
    # phantom speedups (and vice versa as phantom regressions). Pass count
    # is stamped since r16; older artifacts predate the stamp (assume 1
    # for pre-r15, 2 for r15 — the min-of-2 protocol landed then).
    np_, bp = new.get("passes"), base.get("passes")
    if np_ is not None and bp is not None and np_ != bp:
        print(f"WARNING: pass counts differ (new min-of-{np_} vs baseline "
              f"min-of-{bp}) — cross-artifact deltas are biased toward the "
              f"higher-pass side; compare trends, not single cells.")
    elif np_ is not None and bp is None:
        print(f"note: new artifact is min-of-{np_}; baseline predates the "
              f"passes stamp.")

    failed = new.get("failed", [])
    regressions = [
        (name, t, bq[name])
        for name, t in nq.items()
        if name in bq and name not in ALLOWED and t > 2 * bq[name] and t > 0.5
    ]
    added = sorted(set(nq) - set(bq))
    comparable = sum(t for name, t in nq.items() if name in bq)

    print(f"total {new['value']:.1f}s over {len(nq)} queries | "
          f"comparable subset {comparable:.1f}s vs baseline {base['value']:.1f}s")
    if added:
        print(f"new queries ({len(added)}): " +
              ", ".join(f"{n}={nq[n]:.2f}s" for n in added))
    ranked = sorted(regressions, key=lambda x: -x[1] / x[2])
    for name, t, b in ranked:
        print(f"REGRESSION {name}: {t:.2f}s vs {b:.2f}s ({t/b:.1f}x)")
    # ≥2 of the top-3 inflated cells being first-touchers is the cold
    # fingerprint (the remainder is usually a cold page-cache read of the
    # source tables); a single noisy cell is not a signature
    if (len(ranked) >= 2
            and sum(name in FIRST_TOUCHERS for name, _, _ in ranked[:3]) >= 2):
        print("COLD-ENVIRONMENT SIGNATURE: the most-inflated queries are all "
              "scratch-dataset first-touchers — this artifact almost certainly "
              "measured one-time /tmp dataset construction in a cold sandbox, "
              "not a code regression. Compare a warm re-run of the same build "
              "before treating any cell above as real.")
    for name in failed:
        print(f"FAILED {name}")
    if not regressions and not failed:
        print("gate OK: no query >2x baseline (and >0.5s), none failed")
    sys.exit(1 if regressions or failed else 0)


if __name__ == "__main__":
    main()
