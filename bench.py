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

# Driver stdout contract (VERDICT r4 item 1): the round record is ONE
# JSON line on fd 1, and round 4's record failed to parse because
# something in the driver environment leaked onto stdout.  Defend at
# the fd level: duplicate the real stdout to a private fd at import,
# then point fd 1 (and sys.stdout) at stderr so every stray print —
# ours, a library's, or a C extension's — lands on stderr.  The one
# JSON line is written through the saved fd by _emit_json_line, which
# re-parses it first so a malformed record can never be emitted.
if __name__ == "__main__":
    _REAL_STDOUT_FD = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
else:                       # imported for its helpers: leave fds alone
    _REAL_STDOUT_FD = 1


def _emit_json_line(obj) -> None:
    line = json.dumps(obj)
    parsed = json.loads(line)           # self-verify before emitting
    assert parsed == obj or parsed is not None
    assert "\n" not in line
    os.write(_REAL_STDOUT_FD, (line + "\n").encode())

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
        # new2all: the corpus queried against its own database (the
        # reference CI shape, main.yml "new2all k18.db seqs.list");
        # best of two — ingest+probe+apply, host tier
        n2a = os.path.join(td, "bench.n2a")
        n2a_times = []
        for _ in range(2):
            t0 = time.perf_counter()
            rc = cli(["new2all", db, list_path, n2a])
            n2a_times.append(time.perf_counter() - t0)
            assert rc == 0, "new2all failed"
        n_lines = sum(1 for _ in open(out))
    assert n_lines == base["n_samples"] + 2, "unexpected output shape"
    return {
        "build_s": round(min(build_times), 2),
        "all2all_s": round(min(a2a_times), 2),
        "new2all_s": round(min(n2a_times), 2),
        "build_runs_s": [round(t, 2) for t in build_times],
        "ref_build_s": base["reference_build_s"],
        "ref_all2all_s": base["reference_all2all_s"],
        "ref_new2all_s": base.get("reference_new2all_s"),
    }


def _dump_partial(out: dict) -> None:
    """Atomically persist the section-so-far: the parent salvages this
    file when the subprocess exceeds its deadline mid-phase, so a
    wedged LAST phase cannot discard the completed ones."""
    path = os.environ.get("KMERDB_BENCH_PARTIAL")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, path)


def scale_device_section(list_path: str, db_path: str, build_s: float,
                         phases: set) -> dict:
    """Everything in the scale section that touches the TPU, grouped
    so bench_scale can run it in bounded subprocesses: an in-flight
    tunnel RPC can wedge forever even while the service answers fresh
    connections (observed 2026-08-19: device-build pull blocked >30
    min, fresh probe fine), so the parent enforces a deadline and
    retries the missing phases on a fresh connection instead of
    hanging the round.  `phases` subsets {a2a, kernel, fused, build};
    results-so-far persist via _dump_partial after every phase."""
    import hashlib
    import numpy as np
    from kmerdb_tpu.cli.main import main as cli
    from kmerdb_tpu.io import dbfile
    from kmerdb_tpu.ops import device_a2a

    out = {}
    db = dbfile.load_db(db_path, dbfile.PATTERNS)
    C_dev = None

    if "a2a" in phases:
        _phase("scale: device all2all (cold)")
        # device tier: cold (fresh programs in this process) then warm
        t0 = time.perf_counter()
        C_dev = device_a2a.all2all_device(db)
        dev_cold_s = time.perf_counter() - t0
        st_cold = dict(device_a2a.last_stats)
        t0 = time.perf_counter()
        C_dev = device_a2a.all2all_device(db)
        dev_warm_s = time.perf_counter() - t0
        st = device_a2a.last_stats
        out["c_dev_sha"] = hashlib.sha256(
            np.ascontiguousarray(C_dev)).hexdigest()
        out["device_all2all_cold_s"] = round(dev_cold_s, 2)
        out["device_phase_cold_s"] = {k: round(v, 2)
                                      for k, v in st_cold.items()
                                      if k.endswith("_s")}
        out["device_all2all_warm_s"] = round(dev_warm_s, 2)
        out["device_gram_flops"] = st["flops"]
        out["device_engine"] = st.get("engine")
        peak = (V5E_INT8_PEAK if st.get("engine") == "s8"
                else V5E_BF16_PEAK)
        out["device_tflops_warm"] = round(
            st["flops"] / dev_warm_s / 1e12, 2)
        out["device_mfu_warm_pct"] = round(
            st["flops"] / dev_warm_s / peak * 100, 2)
        out["device_phase_s"] = {k: round(v, 2) for k, v in st.items()
                                 if k.endswith("_s")}
        _dump_partial(out)

    # kernel-only throughput on this database's resident packed
    # incidence (VERDICT r2 item 1's first-class metric): chained
    # aliased calls, pull cost differenced out.  Degrades to a
    # recorded error (off-TPU, deaf service, OOM) like every other
    # section — the bench line must always print.
    if "kernel" in phases:
        try:
            _phase("scale: kernel_bench")
            kb = device_a2a.kernel_bench(db)
        except Exception as e:
            kb = {"error": str(e)[:300],
                  "kernel_tflops": None, "kernel_mfu_pct": None}
        out["kernel_tflops"] = kb["kernel_tflops"]
        out["kernel_mfu_pct"] = kb["kernel_mfu_pct"]
        out["kernel_bench"] = kb
        _dump_partial(out)

    # fused FASTA->all2all pipeline (ops/fused.py): one process, no
    # database — ingest + merge on host, group Gram on the TPU.  Warm
    # = second call (programs compiled, service warm, arenas grown)
    if "fused" in phases:
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
            if C_dev is not None:
                assert np.array_equal(C_fused, C_dev), \
                    "fused != device pattern path"
            out["c_fused_sha"] = hashlib.sha256(
                np.ascontiguousarray(C_fused)).hexdigest()
            out["fused_pipeline"] = {
                "ingest_s": round(fused_ingest_s, 2),
                "pipeline_cold_s": round(fused_ingest_s + fused_cold_s,
                                         2),
                "pipeline_warm_s": round(fused_ingest_s + fused_warm_s,
                                         2),
                "tier": ("device" if fused_mod.last_stats else "host"),
                "phase_s": {k: round(v, 2)
                            for k, v in fused_mod.last_stats.items()
                            if k.endswith("_s")},
                "n_groups": fused_mod.last_stats.get("n_groups"),
                "parity_vs_pattern_path": C_dev is not None,
                "note": ("FASTA list -> all2all CSV matrix in ONE "
                         "command (all2all -from-fasta), no database "
                         "built; byte-identical output to "
                         "build+all2all"),
            }
        except Exception as e:
            out["fused_pipeline"] = {"error": str(e)[:300]}
        _dump_partial(out)

    # device build tier (VERDICT r2 item 4): record it even where it
    # loses, with the losing phase identified.  Run LAST (it compiles
    # multi-minute XLA sort programs through the tunnel service) and
    # twice: the first run pays one-time program compiles, the second
    # is the steady state — both recorded, vs_host on the warm run
    # (the host build_s is itself a best-of-2).
    if "build" in phases and \
            os.environ.get("KMERDB_BENCH_DEVBUILD", "1") != "0":
        _phase("scale: device build")
        os.environ["KMERDB_BUILD_DEVICE"] = "1"
        # one batch -> one pow2 partition shape -> ONE compile of each
        # device-build program instead of three (byte-invariant:
        # consoles._build_batch_size)
        os.environ["KMERDB_BUILD_BATCH"] = "4096"
        try:
            import filecmp
            dbd_path = os.path.join(SCALE_DIR, "bench_scale_dev.db")
            runs = []
            identical = True
            for _ in range(2):
                if os.path.exists(dbd_path):
                    os.unlink(dbd_path)
                t0 = time.perf_counter()
                rc = cli(["build", list_path, dbd_path])
                runs.append(round(time.perf_counter() - t0, 2))
                assert rc == 0
                identical &= filecmp.cmp(db_path, dbd_path,
                                         shallow=False)
                _phase(f"scale: device build pass done ({runs[-1]} s)")
            os.unlink(dbd_path)
            out["device_build"] = {
                "build_cold_s": runs[0],
                "build_s": runs[-1],
                "byte_identical_db": identical,
                "vs_host_build": round(build_s / runs[-1], 3),
                "cold_note": (
                    "first pass compiles the merge/dedup XLA sort "
                    "programs through the tunneled compile service "
                    "(minutes per shape, no cross-process cache on "
                    "this rig); warm pass is the steady state"),
            }
        except Exception as e:
            out["device_build"] = {"error": str(e)[:300]}
        finally:
            os.environ.pop("KMERDB_BUILD_DEVICE", None)
            os.environ.pop("KMERDB_BUILD_BATCH", None)
        _dump_partial(out)
    return out


_DEVICE_PHASES = ("a2a", "kernel", "fused", "build")


def _run_device_section(list_path: str, db_path: str,
                        build_s: float) -> dict:
    """Run scale_device_section in bounded subprocesses: attempt 1
    runs every phase; on a timeout the partial-results file is
    salvaged and ONE retry runs only the phases still missing (fresh
    process = fresh tunnel connection — wedged-RPC recovery, mirrors
    tests/test_tpu_hardware._run).  KMERDB_BENCH_DEVICE_TIMEOUT_S caps
    each attempt (default 2700 s: the a2a+kernel+fused block takes
    ~6-20 min depending on service warm-up, the device build adds
    one-time multi-minute program compiles)."""
    import subprocess
    timeout = float(os.environ.get("KMERDB_BENCH_DEVICE_TIMEOUT_S",
                                   "2700"))
    partial_path = db_path + ".devsec.json"
    merged = {}

    def missing():
        need = []
        if "device_all2all_warm_s" not in merged:
            need += ["a2a"]
        if "kernel_bench" not in merged:
            need += ["kernel"]
        if "fused_pipeline" not in merged:
            need += ["fused"]
        if "device_build" not in merged and \
                os.environ.get("KMERDB_BENCH_DEVBUILD", "1") != "0":
            need += ["build"]
        return need

    err = None
    for attempt in range(2):
        need = missing()
        if not need:
            break
        if os.path.exists(partial_path):
            os.unlink(partial_path)
        env = dict(os.environ)
        env["KMERDB_BENCH_PARTIAL"] = partial_path
        try:
            # stderr inherited: the child's phase markers / tracebacks
            # stream live (the driver needs a heartbeat during long
            # silent device phases)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scale-device-sub", list_path, db_path,
                 repr(build_s), ",".join(need)],
                timeout=timeout, stdout=subprocess.PIPE, text=True,
                env=env)
            if r.returncode == 0:
                for line in reversed(r.stdout.strip().splitlines()):
                    try:
                        merged.update(json.loads(line))
                        break
                    except json.JSONDecodeError:
                        continue
                else:
                    err = "device section printed no JSON"
                continue
            err = f"device section subprocess exit {r.returncode}"
        except subprocess.TimeoutExpired:
            err = (f"device section attempt {attempt + 1} phases="
                   f"{','.join(need)} exceeded {timeout:.0f} s "
                   f"(wedged tunnel RPC or compile)")
        print(f"bench: {err}", file=sys.stderr)
        # salvage whatever the child persisted before the deadline
        try:
            with open(partial_path) as f:
                merged.update(json.load(f))
        except (OSError, json.JSONDecodeError):
            pass
    if os.path.exists(partial_path):
        os.unlink(partial_path)
    still = missing()
    for ph in still:
        key = {"a2a": "device_a2a", "kernel": "kernel_bench",
               "fused": "fused_pipeline", "build": "device_build"}[ph]
        merged.setdefault(key, {})
        if isinstance(merged[key], dict):
            merged[key].setdefault("error", err or "phase not run")
    if "device_all2all_warm_s" not in merged:
        merged["error"] = err or "device a2a never completed"
    return merged


def bench_scale(base):
    import numpy as np
    from kmerdb_tpu.utils.bench_corpus import generate_scale
    from kmerdb_tpu.cli.main import main as cli
    from kmerdb_tpu.io import dbfile
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
    build_times = []
    for _ in range(2):
        if os.path.exists(db_path):
            os.unlink(db_path)
        t0 = time.perf_counter()
        rc = cli(["build", list_path, db_path])
        build_times.append(time.perf_counter() - t0)
        assert rc == 0, "scale build failed"
    build_s = min(build_times)

    db = dbfile.load_db(db_path, dbfile.PATTERNS)
    S = db.n_samples
    pairs = S * (S - 1) / 2

    # host tier first (pure CPU, cannot wedge): measured once per
    # database content and memoized (the ~2 min scatter would
    # otherwise dominate every bench run)
    _phase("scale: host all2all")
    offs = np.ascontiguousarray(db.pattern_offsets, dtype=np.int64)
    sids = np.ascontiguousarray(db.pattern_sample_ids, dtype=np.uint32)
    memo_key = f"{S}-{db.n_patterns}-{db.n_kmers}"
    memo_path = os.path.join(SCALE_DIR, f"host_a2a_{memo_key}.json")
    import hashlib
    if os.path.exists(memo_path):
        memo = json.loads(open(memo_path).read())
        host_s, host_sha = memo["host_s"], memo.get("host_sha")
    else:
        t0 = time.perf_counter()
        C_host = native.a2a_dense(offs, sids, db.pattern_num_kmers, S)
        host_s = time.perf_counter() - t0
        host_sha = hashlib.sha256(
            np.ascontiguousarray(C_host)).hexdigest()
        with open(memo_path, "w") as f:
            json.dump({"host_s": host_s, "host_sha": host_sha}, f)

    # scale new2all (host tier: pattern-major apply): 256 queries (a
    # corpus prefix) against the 4,096-sample DB, best of two — the
    # reference binary measured 59.6 s on this exact workload
    # (BASELINE_MEASURED scale_reference_new2all_s, 2026-08-20)
    _phase("scale: new2all 256q")
    n2a_s = None
    try:
        q_list = os.path.join(SCALE_DIR, "bench_q256.list")
        with open(list_path) as f, open(q_list, "w") as g:
            for i, line in enumerate(f):
                if i >= 256:
                    break
                g.write(line)
        n2a_times = []
        # pin to the host tier: this benchmarks the pattern-major host
        # apply (the 19x claim), and letting the dispatch touch the
        # device here would eat the process's first-pass service stall
        # inside the measurement (observed 11+ min on this rig)
        prev_n2a = os.environ.get("KMERDB_N2A_DEVICE")
        os.environ["KMERDB_N2A_DEVICE"] = "0"
        try:
            with tempfile.TemporaryDirectory() as td:
                for _ in range(2):
                    t0 = time.perf_counter()
                    rc = cli(["new2all", db_path, q_list,
                              os.path.join(td, "scale.n2a")])
                    n2a_times.append(time.perf_counter() - t0)
                    assert rc == 0, "scale new2all failed"
        finally:
            if prev_n2a is None:
                os.environ.pop("KMERDB_N2A_DEVICE", None)
            else:
                os.environ["KMERDB_N2A_DEVICE"] = prev_n2a
        n2a_s = min(n2a_times)
    except Exception as e:
        n2a_s = None
        print(f"bench: scale new2all failed: {e}", file=sys.stderr)

    dev = _run_device_section(list_path, db_path, build_s)
    if "error" in dev:
        raise RuntimeError(f"device section failed: {dev['error']}")
    if host_sha is not None:
        assert dev["c_dev_sha"] == host_sha, "device != host at scale"
        dev["parity_device_vs_host"] = True
        if dev.get("c_fused_sha") is not None:
            assert dev["c_fused_sha"] == host_sha, \
                "fused != host at scale"
    dev_warm_s = dev["device_all2all_warm_s"]

    total_kmers = int(db.sample_kmer_counts.sum())
    return {
        "tpu_wait_s": round(waited_s, 1),
        "n_samples": S,
        "n_patterns": int(db.n_patterns),
        "total_kmer_instances": total_kmers,
        "build_s": round(build_s, 2),
        "build_runs_s": [round(t, 2) for t in build_times],
        "host_all2all_s": round(host_s, 2),
        "device_cold_note": ("cold includes the shared compile/transfer "
                             "service's first-pass warm-up on this tunneled "
                             "rig (measured variance 25 s - 19 min for "
                             "identical work; absent on directly-attached "
                             "TPU hosts) — steady-state is the warm number"),
        "device_vs_host_speedup": round(host_s / dev_warm_s, 2),
        "pairs_per_s_host": round(pairs / host_s, 1),
        "pairs_per_s_device_warm": round(pairs / dev_warm_s, 1),
        "device_mfu_note": ("warm MFU divides Gram FLOPs by the WHOLE "
                            "device section (incl. fills, pushes and the "
                            "~10 MB/s tunneled result pull, which dominate "
                            "at this corpus's modest FLOP count) against "
                            "the engine's MXU peak; kernel_tflops below "
                            "is the kernel-only figure on resident data"),
        **({"new2all_256q_s": round(n2a_s, 2),
            "ref_new2all_256q_s": base.get("scale_reference_new2all_s"),
            **({"new2all_vs_baseline": round(
                base["scale_reference_new2all_s"] / n2a_s, 2)}
               if base.get("scale_reference_new2all_s") else {})}
           if n2a_s else {}),
        **{k: v for k, v in dev.items() if k != "c_dev_sha"},
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
        **({"new2all_vs_baseline": round(
            base["reference_new2all_s"] / quick["new2all_s"], 2)}
           if quick.get("new2all_s") and base.get("reference_new2all_s")
           else {}),
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

    _emit_json_line({
        "metric": metric,
        "value": round(value, 1),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 4),
        "detail": detail,
    })


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-device-sub":
        # child mode for _run_device_section: ONE JSON line on stdout
        phases = (set(sys.argv[5].split(",")) if len(sys.argv) > 5
                  else set(_DEVICE_PHASES))
        res = scale_device_section(sys.argv[2], sys.argv[3],
                                   float(sys.argv[4]), phases)
        _emit_json_line(res)
    else:
        main()
