"""Two-parallelism scaling evidence (north_rule: N vs 4N executors;
sandbox stand-in: local[N] vs local[4N] on the same input).

Generates a larger deterministic corpus once, runs the full KG job as a
separate process per parallelism level (fresh workdir each), and writes
BENCH/BASELINE.md with throughputs + scaling efficiency.

    python tools/scaling_bench.py [--n-docs 40000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(input_path: str, cpus: int, runs: int = 1) -> dict:
    best = None
    # checkpoint workdirs on tmpfs: the distributed-storage stand-in
    # (BENCH/BASELINE.md) — on the single-disk sandbox a /tmp workdir
    # makes every stage write disk-bound, which caps the high-
    # parallelism side and fabricates a poor scaling ratio
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    for i in range(runs):
        workdir = f"{base}/kg_scale_{cpus}_{i}"
        if os.path.exists(workdir):
            shutil.rmtree(workdir)
        out = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "tools/run_kg_job.py"),
                "--input", input_path, "--workdir", workdir,
                "--cpus", str(cpus), "--catalog", "medical", "--fresh",
            ],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        if best is None or res["wall_sec"] < best["wall_sec"]:
            best = res
        shutil.rmtree(workdir, ignore_errors=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=40000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from gliner_transbronchialbiopsy_spark.sources import corpus

    corpus_dir = f"/tmp/kg_scale_corpus_{args.n_docs}"
    input_path = os.path.join(corpus_dir, "documents.parquet")
    if not os.path.exists(input_path):
        os.makedirs(corpus_dir, exist_ok=True)
        if args.n_docs >= 100_000:
            corpus.write_corpus_sharded(
                corpus_dir, n_docs=args.n_docs, shards=16, seed=42
            )
        else:
            corpus.write_corpus(corpus_dir, n_docs=args.n_docs, seed=42)

    low = run_level(input_path, args.low, args.runs)
    high = run_level(input_path, args.high, args.runs)
    factor = args.high / args.low
    efficiency = (high["triples_per_sec"] / low["triples_per_sec"]) / factor

    result = {
        "n_docs": args.n_docs,
        "low": low,
        "high": high,
        "speedup": round(high["triples_per_sec"] / low["triples_per_sec"], 3),
        "parallelism_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # BENCH/BASELINE.md is hand-curated (it aggregates interleaved
    # pairs, honesty notes and per-round deltas) — this tool writes its
    # single-shot result next to it instead of clobbering it
    md = os.path.join(REPO, "BENCH", "SCALING_LAST.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/SCALING_LAST — single-shot scaling run (see BASELINE.md for curated pairs)

## Scaling evidence (north_rule: N -> 4N executors; sandbox stand-in:
## local[{args.low}] -> local[{args.high}] threads, same input)

Input: deterministic synthetic biopsy corpus, {args.n_docs} documents
(seed 42, `gliner_transbronchialbiopsy_spark.sources.corpus`), full
4-stage KG pipeline (sectionize -> detect+merge -> link+CC -> triples),
fresh checkpoints per run, separate JVM per level.

| parallelism | docs | triples | wall (s) | triples/sec | docs/sec |
|---|---|---|---|---|---|
| local[{args.low}] | {low['docs']} | {low['triples']} | {low['wall_sec']} | {low['triples_per_sec']} | {low['docs_per_sec']} |
| local[{args.high}] | {high['docs']} | {high['triples']} | {high['wall_sec']} | {high['triples_per_sec']} | {high['docs_per_sec']} |

- speedup {args.low}->{args.high} threads: **{result['speedup']}x**
  (ideal {factor}x)
- **scaling efficiency: {result['scaling_efficiency']}** (target >= 0.8)

## Reference comparison

The reference's only published throughput is GLiNER fine-tune eval at
~1.0-1.14 samples/s on a single GPU node (BASELINE.md). Our
deterministic-detector pipeline processes {high['docs_per_sec']} docs/s
at local[{args.high}]; the model-swap path (`detect_mentions_gliner`)
replaces only the UDF body, so pipeline overhead stays identical.
"""
        )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
