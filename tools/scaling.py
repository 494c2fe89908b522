"""Two-parallelism-level scaling evidence (north_rule: efficiency ≥ 0.8
between N and 4N executors; evidenced here as local[N] vs local[4N] on the
same input, per BASELINE.md protocol — default 8 vs 32, overridable to
e.g. 2 vs 8 where the larger level would exceed the host's effective
(steal-free) core count).

Runs bench.py at both levels in fresh subprocesses (one JVM each), checks
the determinism fingerprint matches, computes
    eff = (throughput@32 / throughput@8) / 4
and writes the table into BENCH.md (+ raw JSON to BENCH_SCALING.json).

Usage: python tools/scaling.py [sf_dir] [n_small] [n_large]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, sf_dir: str, runs: int) -> dict:
    """One fresh-process bench rep at one parallelism level."""
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_RUNS=str(runs),
        # scaling reps keep the committed suite composition + fingerprint
        # protocol; the DSL-extension block is benched separately
        BENCH_DSL="0",
    )
    # corpus large enough that work, not fixed overhead, is measured
    env.setdefault("BENCH_GEN_DOCS", "120000")
    # one shared corpus across reps AND levels (deterministic generation),
    # so no rep pays generation and both levels read identical bytes
    env.setdefault(
        "BENCH_CORPUS_DIR",
        f"/tmp/lc_bench_corpus_{env['BENCH_GEN_DOCS']}",
    )
    sys.path.insert(0, REPO)
    from librecatastro_spark.corpus import corpus_cache_valid

    if not corpus_cache_valid(
        env["BENCH_CORPUS_DIR"], int(env["BENCH_GEN_DOCS"])
    ):
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from librecatastro_spark.session import get_spark; "
            "from librecatastro_spark.corpus import materialize_corpus; "
            "s = get_spark('gen', cores=32, shuffle_partitions=32); "
            "materialize_corpus(s, %d, %r)"
            % (REPO, int(env["BENCH_GEN_DOCS"]), env["BENCH_CORPUS_DIR"])
        )
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=3600)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_pair(n_small: int, n_large: int, sf_dir: str, runs: int) -> tuple[dict, dict]:
    """Best-of-REPS per level, with the two levels' reps INTERLEAVED
    (small, large, small, large, …). The sandbox VM has bursty hypervisor
    steal (single-run wall time varies ±2× on identical code); running
    all of one level then all of the other lets a burst poison exactly
    one level and fabricate an efficiency number in either direction —
    interleaving spreads any burst across both, and best-of-reps picks
    each level's minimum-interference run."""
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    best = {n_small: None, n_large: None}
    for _ in range(reps):
        for cores in (n_small, n_large):
            r = run_once(cores, sf_dir, runs)
            b = best[cores]
            if b is not None and r["results_sha"] != b["results_sha"]:
                raise AssertionError("nondeterministic results across reps")
            if b is None or r["build_gb_per_hr"] > b["build_gb_per_hr"]:
                best[cores] = r
    return best[n_small], best[n_large]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n_small
    runs = int(os.environ.get("BENCH_RUNS", "10"))
    r8, r32 = run_pair(n_small, n_large, sf_dir, runs)
    ratio = n_large / n_small
    eff = (r32["build_gb_per_hr"] / r8["build_gb_per_hr"]) / ratio
    det = r8["results_sha"] == r32["results_sha"]
    q8 = sum(v for k, v in r8["queries"].items() if k != "build_index")
    q32 = sum(v for k, v in r32["queries"].items() if k != "build_index")
    out = {
        "sf_dir": sf_dir,
        f"local{n_small}": r8,
        f"local{n_large}": r32,
        "build_scaling_efficiency": round(eff, 3),
        "query_suite_speedup": round(q8 / q32, 3) if q32 else None,
        "deterministic_across_levels": det,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=2)

    # preserve the hand-maintained analysis tail (host-wall measurements,
    # fixed-overhead decomposition) across regenerations: everything from
    # the ANALYSIS marker on survives
    marker = "<!-- ANALYSIS:KEEP -->"
    analysis = ""
    bench_path = os.path.join(REPO, "BENCH.md")
    if os.path.exists(bench_path):
        prev = open(bench_path).read()
        if marker in prev:
            analysis = prev[prev.index(marker):]

    md = f"""# BENCH — scaling evidence

Protocol (BASELINE.md): identical index-build + golden-query job at
`local[{n_small}]` and `local[{n_large}]` on the same input (N vs
{ratio:g}N cores); no real cluster exists in this sandbox, so N vs 4N
executors is evidenced by N vs 4N local cores.
Input: deterministic synthetic source-code corpus at the input_hint
schema, {r8.get('corpus_docs', '?')} docs / {r8.get('corpus_gb', '?')} GB
(identical bytes at both levels by construction — counter-based
splitmix64 streams, parallelism-independent). Caveat: this sandbox is a
shared VM with bursty hypervisor steal time; single-run numbers vary
±2×, so treat ratios, not absolutes, as the signal.

| metric | local[{n_small}] | local[{n_large}] |
|---|---|---|
| index build (s) | {r8['build_sec']} | {r32['build_sec']} |
| build throughput (GB/hr) | {r8['build_gb_per_hr']} | {r32['build_gb_per_hr']} |
| query p95 (ms, distributed path) | {r8['query_p95_ms']} | {r32['query_p95_ms']} |
| query p95 (ms, serving fast path) | {r8.get('fastpath_p95_ms', '—')} | {r32.get('fastpath_p95_ms', '—')} |
| query suite total (s) | {round(q8, 3)} | {round(q32, 3)} |
| results fingerprint | `{r8['results_sha']}` | `{r32['results_sha']}` |

**Build scaling efficiency (throughput@{n_large} / throughput@{n_small})
/ {ratio:g} = {round(eff, 3)}** (target ≥ 0.8).

**Determinism across parallelism levels:** {'IDENTICAL results' if det else 'MISMATCH (bug!)'} —
both levels return byte-identical (doc_id, score) lists over the full
query suite, per the north_rule requirement that cluster size cannot
change results.

Raw per-query numbers: `BENCH_SCALING.json`.

{analysis}"""
    with open(bench_path, "w") as fh:
        fh.write(md)
    print(json.dumps(r8))
    print(json.dumps(r32))
    print(f"efficiency={eff:.3f} deterministic={det}")
    return 0 if det else 1


if __name__ == "__main__":
    raise SystemExit(main())
