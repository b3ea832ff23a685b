"""Benchmark: build + all2all on two corpora, host and TPU tiers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Two sections:

* quick  — 128 x 300 kbp corpus (round-1 continuity): build best-of-3
  + host all2all; the reference baseline for it is in
  BASELINE_MEASURED.json ("quick" keys).
* scale  — 4,096 x 30 kbp outbreak-style phylogenetic corpus
  (bench_corpus.generate_scale: the ICTV-scale role).  Measures build,
  the host C++ all2all tier, and the TPU device tier cold (fresh
  programs) and warm (steady state), with derived pairs/s and MFU.

Headline value = end-to-end (build + device all2all) k-mer instance
throughput on the scale corpus.  vs_baseline compares against the
measured reference wall-clock on the same corpus and host.

HONESTY LABELS: the bench host has 1 vCPU, so the reference's
`-t 16` degrades to ~1 thread — reference numbers carry
baseline_threads_effective=1, and vs_baseline_16t_projected divides
the reference time by 16 (its all2all scales near-linearly with
threads) so the multi-thread bar cannot be misread.

KMERDB_BENCH_SCALE=0 skips the scale section (quick-only mode).
"""

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_DIR = os.environ.get("KMERDB_BENCH_CORPUS", "/tmp/kmerdb_bench_corpus")
SCALE_DIR = os.environ.get("KMERDB_BENCH_SCALE_CORPUS",
                           "/tmp/kmerdb_scale4k")
V5E_BF16_PEAK = 1.97e14  # FLOP/s, one v5e chip
V5E_INT8_PEAK = 3.94e14  # int8 MXU rate (the s8 Gram engine's peak)


def _phase(name: str) -> None:
    """Timestamped phase marker on stderr: the scale section runs many
    minutes of silent device work, and a stalled run must be
    attributable to a phase (service stall vs compile vs pull)."""
    print(f"bench: [{time.strftime('%H:%M:%S')}] {name}", file=sys.stderr,
          flush=True)


def bench_quick(base):
    from kmerdb_tpu.utils.bench_corpus import generate
    from kmerdb_tpu.cli.main import main as cli

    list_path = generate(CORPUS_DIR)
    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "bench.db")
        out = os.path.join(td, "bench.a2a")
        # best of three: page provisioning and writeback speed swing
        # 2-3x run-to-run on this host (round-1 measurements)
        build_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rc = cli(["build", list_path, db])
            build_times.append(time.perf_counter() - t0)
            assert rc == 0, "build failed"
        a2a_times = []
        for _ in range(2):
            t0 = time.perf_counter()
            rc = cli(["all2all", db, out])
            a2a_times.append(time.perf_counter() - t0)
            assert rc == 0, "all2all failed"
        n_lines = sum(1 for _ in open(out))
    assert n_lines == base["n_samples"] + 2, "unexpected output shape"
    return {
        "build_s": round(min(build_times), 2),
        "all2all_s": round(min(a2a_times), 2),
        "build_runs_s": [round(t, 2) for t in build_times],
        "ref_build_s": base["reference_build_s"],
        "ref_all2all_s": base["reference_all2all_s"],
    }


def bench_scale(base):
    import numpy as np
    from kmerdb_tpu.utils.bench_corpus import generate_scale
    from kmerdb_tpu.cli.main import main as cli
    from kmerdb_tpu.io import dbfile
    from kmerdb_tpu.ops import device_a2a
    from kmerdb_tpu.utils import native

    # The bench is the once-per-round measurement and the rig's TPU
    # service outages are known to last hours: ride them out with a
    # bounded re-probe loop instead of aborting on the first bounded
    # probe (KMERDB_BENCH_WAIT_TPU_S caps the wait; 0 = single probe).
    from kmerdb_tpu.utils import hwprobe
    budget = float(os.environ.get("KMERDB_BENCH_WAIT_TPU_S", "1800"))
    deadline = time.time() + budget
    waited_s = 0.0
    while not hwprobe.machine_probe():
        remaining = deadline - time.time()
        if remaining <= 0:
            # without the chip the device/kernel sections would either
            # hang on backend init (deaf service) or run interpreted
            # Mosaic for hours; degrade to a recorded error (main()
            # catches) and let the quick + mesh sections carry the line
            raise RuntimeError(
                "TPU unavailable after waiting %.0fs (bounded hwprobe "
                "re-probes every 5 min): scale section skipped" % budget)
        nap = min(300.0, remaining)
        print("bench: TPU service down, re-probing in %.0fs "
              "(%.0fs budget left)" % (nap, remaining), file=sys.stderr)
        time.sleep(nap)
        waited_s = budget - max(0.0, deadline - time.time())
    list_path = generate_scale(SCALE_DIR, n_samples=4096,
                               genome_len=30_000, branch_rate=0.0008)
    db_path = os.path.join(SCALE_DIR, "bench_scale.db")
    if os.path.exists(db_path):
        os.unlink(db_path)
    # absorb the compile service's first-contact init while the build
    # runs (the service shares this 1-vCPU host; its libtpu pages are
    # evicted by big host work, so warm it early and run the device
    # tier BEFORE the host scatter churns memory again)
    device_a2a.warmup_async()
    build_times = []
    for _ in range(2):
        if os.path.exists(db_path):
            os.unlink(db_path)
        t0 = time.perf_counter()
        rc = cli(["build", list_path, db_path])
        build_times.append(time.perf_counter() - t0)
        assert rc == 0, "scale build failed"
    build_s = min(build_times)

    _phase("scale: device all2all (cold)")
    db = dbfile.load_db(db_path, dbfile.PATTERNS)
    S = db.n_samples
    pairs = S * (S - 1) / 2

    # device tier: cold (fresh programs in this process) then warm
    t0 = time.perf_counter()
    C_dev = device_a2a.all2all_device(db)
    dev_cold_s = time.perf_counter() - t0
    st_cold = dict(device_a2a.last_stats)
    t0 = time.perf_counter()
    C_dev = device_a2a.all2all_device(db)
    dev_warm_s = time.perf_counter() - t0
    st = device_a2a.last_stats

    # host tier: measured once per database content and memoized (the
    # 155 s scatter would otherwise dominate every bench run); the
    # device/host parity assert still runs on every fresh measurement
    offs = np.ascontiguousarray(db.pattern_offsets, dtype=np.int64)
    sids = np.ascontiguousarray(db.pattern_sample_ids, dtype=np.uint32)
    memo_key = f"{S}-{db.n_patterns}-{db.n_kmers}"
    memo_path = os.path.join(SCALE_DIR, f"host_a2a_{memo_key}.json")
    if os.path.exists(memo_path):
        host_s = json.loads(open(memo_path).read())["host_s"]
    else:
        t0 = time.perf_counter()
        C_host = native.a2a_dense(offs, sids, db.pattern_num_kmers, S)
        host_s = time.perf_counter() - t0
        assert np.array_equal(C_dev, C_host), "device != host at scale"
        with open(memo_path, "w") as f:
            json.dump({"host_s": host_s}, f)

    # kernel-only throughput on this database's resident packed
    # incidence (VERDICT r2 item 1's first-class metric): chained
    # aliased calls, pull cost differenced out.  Degrades to a
    # recorded error (off-TPU, deaf service, OOM) like every other
    # section — the bench line must always print.
    try:
        _phase("scale: kernel_bench")
        kb = device_a2a.kernel_bench(db)
    except Exception as e:
        kb = {"error": str(e)[:300],
              "kernel_tflops": None, "kernel_mfu_pct": None}
    peak = (V5E_INT8_PEAK if st.get("engine") == "s8"
            else V5E_BF16_PEAK)

    # fused FASTA->all2all pipeline (ops/fused.py): one process, no
    # database — ingest + merge on host, group Gram on the TPU.  Warm
    # = second call (programs compiled, service warm, arenas grown)
    try:
        _phase("scale: fused pipeline")
        from kmerdb_tpu.ops import fused as fused_mod
        from kmerdb_tpu.cli import loader
        tf0 = time.perf_counter()
        streams = [s.kmers for s in loader.iter_samples(
            list_path, "genome", 18, 1.0, 0.0, "nt", False)]
        fused_ingest_s = time.perf_counter() - tf0
        tf0 = time.perf_counter()
        C_fused = fused_mod.all2all_group_counts(streams)
        fused_cold_s = time.perf_counter() - tf0
        fused_mod.last_stats.clear()
        tf0 = time.perf_counter()
        C_fused = fused_mod.all2all_group_counts(streams)
        fused_warm_s = time.perf_counter() - tf0
        assert np.array_equal(C_fused, C_dev), \
            "fused != device pattern path"
        fused = {
            "ingest_s": round(fused_ingest_s, 2),
            "pipeline_cold_s": round(fused_ingest_s + fused_cold_s, 2),
            "pipeline_warm_s": round(fused_ingest_s + fused_warm_s, 2),
            "tier": ("device" if fused_mod.last_stats else "host"),
            "phase_s": {k: round(v, 2)
                        for k, v in fused_mod.last_stats.items()
                        if k.endswith("_s")},
            "n_groups": fused_mod.last_stats.get("n_groups"),
            "parity_vs_pattern_path": True,
            "note": ("FASTA list -> all2all CSV matrix in ONE command "
                     "(all2all -from-fasta), no database built; byte-"
                     "identical output to build+all2all"),
        }
    except Exception as e:
        fused = {"error": str(e)[:300]}

    # device build tier (VERDICT r2 item 4): record it even where it
    # loses, with the losing phase identified
    _phase("scale: device build")
    dev_build = {}
    if os.environ.get("KMERDB_BENCH_DEVBUILD", "1") != "0":
        os.environ["KMERDB_BUILD_DEVICE"] = "1"
        try:
            dbd_path = os.path.join(SCALE_DIR, "bench_scale_dev.db")
            if os.path.exists(dbd_path):
                os.unlink(dbd_path)
            t0 = time.perf_counter()
            rc = cli(["build", list_path, dbd_path])
            dev_build_s = time.perf_counter() - t0
            assert rc == 0
            import filecmp
            identical = filecmp.cmp(db_path, dbd_path, shallow=False)
            os.unlink(dbd_path)
            dev_build = {
                "build_s": round(dev_build_s, 2),
                "byte_identical_db": identical,
                "vs_host_build": round(build_s / dev_build_s, 3),
                "losing_phase": (
                    "device->host pull of the merged value stream "
                    "(~0.5 GB at the tunnel's ~10 MB/s) needed for CSR "
                    "assembly + DB serialization; on directly-attached "
                    "hosts the pull is PCIe-speed and the sort/segment "
                    "work rides HBM"),
            }
        except Exception as e:
            dev_build = {"error": str(e)[:300]}
        finally:
            os.environ.pop("KMERDB_BUILD_DEVICE", None)

    total_kmers = int(db.sample_kmer_counts.sum())
    return {
        "tpu_wait_s": round(waited_s, 1),
        "n_samples": S,
        "n_patterns": int(db.n_patterns),
        "total_kmer_instances": total_kmers,
        "build_s": round(build_s, 2),
        "build_runs_s": [round(t, 2) for t in build_times],
        "host_all2all_s": round(host_s, 2),
        "device_all2all_cold_s": round(dev_cold_s, 2),
        "device_cold_note": ("cold includes the shared compile/transfer "
                             "service's first-pass warm-up on this tunneled "
                             "rig (measured variance 25 s - 19 min for "
                             "identical work; absent on directly-attached "
                             "TPU hosts) — steady-state is the warm number"),
        "device_phase_cold_s": {k: round(v, 2) for k, v in st_cold.items()
                                if k.endswith("_s")},
        "device_all2all_warm_s": round(dev_warm_s, 2),
        "device_vs_host_speedup": round(host_s / dev_warm_s, 2),
        "pairs_per_s_host": round(pairs / host_s, 1),
        "pairs_per_s_device_warm": round(pairs / dev_warm_s, 1),
        "device_gram_flops": st["flops"],
        "device_engine": st.get("engine"),
        "device_tflops_warm": round(st["flops"] / dev_warm_s / 1e12, 2),
        "device_mfu_warm_pct": round(
            st["flops"] / dev_warm_s / peak * 100, 2),
        "device_mfu_note": ("warm MFU divides Gram FLOPs by the WHOLE "
                            "device section (incl. fills, pushes and the "
                            "~10 MB/s tunneled result pull, which dominate "
                            "at this corpus's modest FLOP count) against "
                            "the engine's MXU peak; kernel_tflops below "
                            "is the kernel-only figure on resident data"),
        "kernel_tflops": kb["kernel_tflops"],
        "kernel_mfu_pct": kb["kernel_mfu_pct"],
        "kernel_bench": kb,
        "fused_pipeline": fused,
        "device_build": dev_build,
        "device_phase_s": {k: round(v, 2) for k, v in st.items()
                           if k.endswith("_s")},
        "ref_build_s": base.get("scale_reference_build_s"),
        "ref_all2all_s": base.get("scale_reference_all2all_s"),
    }


def bench_mesh_scaling():
    """Multi-device scaling curve on a VIRTUAL CPU mesh (the only
    multi-device geometry this rig offers — one real TPU chip behind a
    tunnel).  Validates that the same CLI-reachable sharded kernels
    (-mesh N) execute and agree byte-for-byte at every device count;
    the wall-clock column is labeled what it is: N virtual devices
    TIME-SLICING ONE physical core, so it measures sharding overhead,
    not speedup.  On a real v5e-8 the same code rides ICI."""
    import hashlib
    import subprocess
    import sys

    from kmerdb_tpu.utils.bench_corpus import generate
    from kmerdb_tpu.cli.main import main as cli

    list_path = generate(CORPUS_DIR)
    db_path = os.path.join(CORPUS_DIR, "mesh_bench.db")
    if not os.path.exists(db_path):
        assert cli(["build", list_path, db_path]) == 0

    snippet = """
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh
from kmerdb_tpu.io import dbfile
from kmerdb_tpu.parallel import sharded
n = int(sys.argv[1])
db = dbfile.load_db(sys.argv[2], dbfile.PATTERNS)
mesh = Mesh(np.array(jax.devices()).reshape(n), ("shard",))
t0 = time.perf_counter(); C = sharded.all2all_counts_sharded(db, mesh)
cold = time.perf_counter() - t0
t0 = time.perf_counter(); C = sharded.all2all_counts_sharded(db, mesh)
warm = time.perf_counter() - t0
import hashlib
print(json.dumps({"cold_s": round(cold, 2), "warm_s": round(warm, 2),
                  "sha": hashlib.sha256(np.ascontiguousarray(C)
                                        ).hexdigest()[:16]}))
"""
    out = {}
    shas = set()
    for n in (1, 2, 8):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)   # no tunnel plugin
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) \
            + os.pathsep + env.get("PYTHONPATH", "")
        try:
            r = subprocess.run(
                [sys.executable, "-c", snippet, str(n), db_path],
                env=env, capture_output=True, text=True, timeout=900)
            row = json.loads(r.stdout.strip().splitlines()[-1])
            shas.add(row.pop("sha"))
            out[str(n)] = row
        except Exception as e:
            out[str(n)] = {"error": str(e)[:200]}
    out["byte_identical_across_device_counts"] = len(shas) == 1
    out["note"] = ("N VIRTUAL CPU devices time-slicing 1 physical "
                   "core (no multi-chip hardware on this rig): "
                   "validates the CLI-reachable sharded path at every "
                   "geometry and bounds its overhead; not a speedup "
                   "claim")
    return out


def bench_multihost_virtual():
    """The north star's N>=2-hosts axis, on the only multi-process
    geometry this rig offers: 2 jax.distributed CPU processes x 4
    virtual devices time-slicing ONE core.  Validates the full DCN
    path (host-sharded ingest -> range-sharded build -> psum all2all
    -> new2all -> db2db, every stage byte-asserted in the workers) and
    bounds its overhead; not a speedup claim."""
    import re

    import __graft_entry__ as graft
    raw = graft.dryrun_multihost(2, 4)
    ok_lines = [l for l in raw.splitlines() if "MULTIHOST_OK" in l]
    line = ok_lines[-1] if ok_lines else raw[-200:]
    out = {"ok": bool(ok_lines), "line": line}
    for key in ("a2a_cold_s", "a2a_warm_s"):
        m = re.search(rf"{key}=([0-9.]+)", line)
        if m:
            out[key] = float(m.group(1))
    out["note"] = ("2 jax.distributed processes x 4 VIRTUAL CPU "
                   "devices on 1 physical core: full-pipeline DCN "
                   "validation with byte-asserted stages; wall-clock "
                   "bounds sharding+collective overhead only")
    return out


def main():
    base_path = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    base = json.loads(base_path.read_text())

    quick = bench_quick(base)
    q_total = quick["build_s"] + quick["all2all_s"]
    q_ref = base["reference_total_s"]

    detail = {
        "quick": quick,
        "baseline_threads_effective": 1,
        "baseline_note": ("reference kmer-db 2.3.1 run with -t 16 on a "
                          "1-vCPU host (hardware_concurrency=1): "
                          "effectively single-threaded"),
    }

    if os.environ.get("KMERDB_BENCH_MESH", "1") != "0":
        try:
            detail["mesh_scaling_virtual"] = bench_mesh_scaling()
        except Exception as e:
            detail["mesh_scaling_virtual"] = {"error": str(e)[:300]}
        try:
            detail["multihost_virtual"] = bench_multihost_virtual()
        except Exception as e:
            detail["multihost_virtual"] = {"error": str(e)[:300]}

    scale = None
    if os.environ.get("KMERDB_BENCH_SCALE", "1") != "0" and \
            base.get("scale_reference_total_s"):
        try:
            scale = bench_scale(base)
        except Exception as e:
            detail["scale_error"] = str(e)[:300]
    if scale is not None:
        detail["scale"] = scale
        # steady-state pipeline: warm-build + warm device all2all; the
        # rig's first-pass service stall is reported separately above
        our_total = scale["build_s"] + scale["device_all2all_warm_s"]
        ref_total = base["scale_reference_total_s"]
        value = scale["total_kmer_instances"] / our_total
        vs = ref_total / our_total
        detail["vs_baseline_16t_projected"] = round(vs / 16, 3)
        detail["vs_baseline_incl_cold_stall"] = round(
            ref_total / (scale["build_s"]
                         + scale["device_all2all_cold_s"]), 4)
        fw = scale.get("fused_pipeline", {}).get("pipeline_warm_s")
        if fw:
            detail["fused_vs_baseline"] = round(ref_total / fw, 2)
            detail["fused_vs_baseline_16t_projected"] = round(
                ref_total / fw / 16, 3)
        metric = ("build+all2all kmer instances/s "
                  "(4096x30kbp scale corpus, k=18, device tier)")
    else:
        value = base["total_kmer_instances"] / q_total
        vs = q_ref / q_total
        detail["vs_baseline_16t_projected"] = round(vs / 16, 3)
        metric = ("build+all2all kmer instances/s "
                  "(128x300kbp corpus, k=18)")

    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
