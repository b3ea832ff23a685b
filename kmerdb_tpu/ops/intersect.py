"""Common-k-mer counting kernels.

The flagship all2all kernel re-expresses the reference's
decompress + SIMD row_add scatter pipeline
(similarity_calculator.cpp:42-438, src/simd/row_add_avx2.cpp) as MXU
contractions.  With B the (patterns x samples) 0/1 incidence matrix
and w the per-pattern k-mer multiplicity:

    C = B^T diag(w) B        (C[i,j] = |kmers(i) ∩ kmers(j)|)

Exactness on the MXU: w is split into 8-bit limbs; each limb matmul
runs in bfloat16 with float32 accumulation (all quantities are
integers < 2^24, so f32 accumulation is exact), partial results are
cast to uint32 and recombined with shifts.  uint32 wraparound matches
the reference's num_kmers_t arithmetic.

one2all probes query k-mers against the sorted k-mer array (vectorized
binary search — replacing hashtable probes, similarity_calculator.cpp:
661-925), histograms pattern ids, and applies counts through the
pattern CSR.
"""

import functools
import os

import numpy as np

from .._jaxinit import jax_modules
from ..models.database import KmerPatternDb

#: patterns per device chunk (fits u16 row ids incl. the dummy row);
#: 255 * (_CHUNK+1) stays < 2^24 for exact f32 accumulation.
_CHUNK = 32768
#: CSR elements per device chunk
_CHUNK_E = 1 << 20


def _on_tpu() -> bool:
    """pallas_gram.on_tpu without the ~1.3 s pallas module import —
    tier-dispatch gates must stay cheap on the host-only path."""
    from ..utils import hwprobe
    return hwprobe.tpu_available()


def _gram_chunk(C, B_i8, w_full, n_limbs):
    """C += B^T diag(w) B for one pattern chunk (XLA limb path).

    B_i8: int8[P_pad, S_pad] 0/1 incidence (host-built).
    w_full: uint32[P_pad] chunk pattern weights (0 on pad rows).
    """
    jax, jnp = jax_modules()
    B = B_i8.astype(jnp.bfloat16)
    for l in range(n_limbs):
        w_l = ((w_full >> np.uint32(8 * l)) & np.uint32(0xFF)
               ).astype(jnp.bfloat16)
        A = B * w_l[:, None]
        partial = jax.lax.dot_general(
            A, B, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        C = C + (partial.astype(jnp.uint32) << np.uint32(8 * l))
    return C



def _cross_chunk(C, U_i8, V_i8, w_full, n_limbs):
    """C += U^T diag(w) V for one pattern-PAIR chunk (XLA limb path).

    The cross-database kernel in MXU form: each intersecting pattern
    pair (p1, p2) with m shared k-mers contributes
    m * outer(b1_p1, b2_p2); gathering the incidence rows of the pair
    list gives C = U^T diag(m) V — the asymmetric twin of the all2all
    Gram (same 8-bit-limb exactness bounds)."""
    jax, jnp = jax_modules()
    U = U_i8.astype(jnp.bfloat16)
    V = V_i8.astype(jnp.bfloat16)
    for l in range(n_limbs):
        w_l = ((w_full >> np.uint32(8 * l)) & np.uint32(0xFF)
               ).astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            U * w_l[:, None], V,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        C = C + (partial.astype(jnp.uint32) << np.uint32(8 * l))
    return C


def _gathered_incidence(pids, offs, sids, n_chunks, P_pad, S_pad):
    """int8[n_chunks, P_pad, S_pad]: row i of chunk c is the sample
    incidence of pattern pids[c * P_pad + i] (host-built)."""
    from ..utils import native
    lens = (offs[1:] - offs[:-1])[pids]
    B = native.alloc_array(n_chunks * P_pad * S_pad, np.int8,
                           populate=False).reshape(n_chunks, P_pad, S_pad)
    for c in range(n_chunks):
        sel = pids[c * P_pad:(c + 1) * P_pad]
        l_c = lens[c * P_pad:(c + 1) * P_pad]
        out_off = np.zeros(sel.size + 1, dtype=np.int64)
        np.cumsum(l_c, out=out_off[1:])
        cols = np.empty(out_off[-1], dtype=np.uint32)
        native.gather_ragged_u32(np.ascontiguousarray(sel), offs,
                                 sids, out_off[:-1].copy(), cols)
        rows = np.repeat(np.arange(sel.size, dtype=np.int32),
                         l_c).astype(np.int32)
        native.fill_incidence(rows, cols.astype(np.int32), B[c])
    return B


@functools.lru_cache(maxsize=None)
def _jit_cross_acc(n_limbs: int, interpret: bool, engine: str = "bf16",
                   kt: int | None = None, tile: int | None = None):
    jax, _ = jax_modules()
    from . import pallas_gram

    def step(Up, Vp, w, C):
        return pallas_gram.cross_u32_pk(Up, Vp, w, C, n_limbs=n_limbs,
                                        interpret=interpret, kt=kt,
                                        tile=tile, engine=engine)

    return jax.jit(step, donate_argnums=(3,))


def _d2d_device(db_row, db_col, up1, up2, cnts):
    """Device tier of db2db: pattern-pair chunks contracted on the MXU
    through the packed Mosaic cross kernel (cross_u32_pk) — bit-packed
    pair-axis incidence filled straight from both CSRs, C accumulated
    on device, one pull.  Mosaic-only for the same compile-latency
    reasons as the all2all tier (ops/device_a2a module doc)."""
    import jax
    from . import pallas_gram
    from . import device_a2a
    from ..utils import native
    jax, jnp = jax_modules()
    S1, S2 = db_row.n_samples, db_col.n_samples
    engine, KT, TILE = device_a2a._geometry(min(S1, S2))
    S1_pad = _round_up(S1, TILE)
    S2_pad = _round_up(S2, TILE)
    n_pairs = up1.size
    rows = min(_round_up(max(n_pairs, 1), KT), 8 * _CHUNK)
    n_limbs = max(1, -(-int(cnts.max()).bit_length()
                       // pallas_gram.LIMB_BITS[engine]))

    interp = not pallas_gram.on_tpu()
    ex = device_a2a.aot_compile(
        ("cross_acc", n_limbs, interp, engine, KT, TILE),
        _jit_cross_acc(n_limbs, interp, engine, KT, TILE),
        jax.ShapeDtypeStruct((rows // 8, S1_pad), jnp.uint8),
        jax.ShapeDtypeStruct((rows // 8, S2_pad), jnp.uint8),
        jax.ShapeDtypeStruct((rows, 1), jnp.uint32),
        jax.ShapeDtypeStruct((S1_pad, S2_pad), jnp.uint32))

    o1 = np.ascontiguousarray(db_row.pattern_offsets, dtype=np.int64)
    s1 = np.ascontiguousarray(db_row.pattern_sample_ids, dtype=np.uint32)
    o2 = np.ascontiguousarray(db_col.pattern_offsets, dtype=np.int64)
    s2 = np.ascontiguousarray(db_col.pattern_sample_ids, dtype=np.uint32)

    Ubuf = np.zeros((rows // 8, S1_pad), dtype=np.uint8)
    Vbuf = np.zeros((rows // 8, S2_pad), dtype=np.uint8)
    wbuf = np.zeros(rows, dtype=np.uint32)
    C = jax.device_put(np.zeros((S1_pad, S2_pad), dtype=np.uint32))
    for g0 in range(0, n_pairs, rows):
        g1 = min(n_pairs, g0 + rows)
        Ubuf[:] = 0
        Vbuf[:] = 0
        wbuf[:] = 0
        p1c = np.ascontiguousarray(up1[g0:g1])
        p2c = np.ascontiguousarray(up2[g0:g1])
        if native.available:
            native.fill_incidence_bits(p1c, o1, s1, Ubuf)
            native.fill_incidence_bits(p2c, o2, s2, Vbuf)
        else:
            for i in range(g1 - g0):
                Ubuf[i >> 3, s1[o1[p1c[i]]:o1[p1c[i] + 1]]] |= \
                    np.uint8(1 << (i & 7))
                Vbuf[i >> 3, s2[o2[p2c[i]]:o2[p2c[i] + 1]]] |= \
                    np.uint8(1 << (i & 7))
        wbuf[:g1 - g0] = cnts[g0:g1]
        # copies: never hand live views of reused scratch to the
        # async device_put (see device_a2a.packed_group)
        C = ex(jax.device_put(Ubuf.copy()),
               jax.device_put(Vbuf.copy()),
               jax.device_put(pallas_gram.pk_weight_order(
                   wbuf, KT).reshape(-1, 1)), C)
    return np.asarray(C)[:S1, :S2]


def _run_length_counts(sorted_arr: np.ndarray):
    """(unique_values int64[], counts uint32[]) of a sorted array."""
    if sorted_arr.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint32))
    boundary = np.empty(sorted_arr.size, dtype=bool)
    boundary[0] = True
    np.not_equal(sorted_arr[1:], sorted_arr[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    uniq = sorted_arr[starts].astype(np.int64)
    counts = np.diff(np.append(starts, sorted_arr.size)).astype(np.uint32)
    return uniq, counts


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def _jit_a2a():
    jax, _ = jax_modules()
    return functools.partial(
        jax.jit, static_argnames=("n_limbs", "use_pallas", "triangle")
    )(_a2a_scan_impl)


def _a2a_scan(B_all, w_all, *, n_limbs, use_pallas=False, triangle=True):
    return _jit_a2a()(B_all, w_all, n_limbs=n_limbs,
                      use_pallas=use_pallas, triangle=triangle)


def _a2a_scan_impl(B_all, w_all, *, n_limbs, use_pallas=False,
                   triangle=True):
    """Whole all2all in ONE dispatch: lax.scan over pattern chunks.

    B_all: int8[n_chunks, P_pad, S_pad] host-built incidence blocks
    (building B on the host replaces an on-device scatter, which
    serializes badly on TPU).  w_all: uint32[n_chunks, P_pad].
    With use_pallas the chunk Gram runs in the fused Pallas TPU kernel
    (ops/pallas_gram.py): one pass over B tiles for all weight limbs.
    Returns uint32[S_pad, S_pad]; caller slices the real S.
    """
    jax, jnp = jax_modules()
    S_pad = B_all.shape[2]
    C0 = jnp.zeros((S_pad, S_pad), dtype=jnp.uint32)

    if use_pallas:
        from . import pallas_gram
        if triangle:
            # triangle grid computes only tile_row >= tile_col; upper
            # tiles come back uninitialized, discarded after the scan
            def chunk_gram(C, B, w):
                return C + pallas_gram.gram_u32_tri(B, w[:, None],
                                                    n_limbs=n_limbs)
        else:
            def chunk_gram(C, B, w):
                return C + pallas_gram.gram_u32(B, w[:, None],
                                                n_limbs=n_limbs)
    else:
        def chunk_gram(C, B, w):
            return _gram_chunk(C, B, w, n_limbs)

    def step(C, chunk):
        B, w = chunk
        return chunk_gram(C, B, w), None

    C, _ = jax.lax.scan(step, C0, (B_all, w_all))
    if use_pallas and triangle:
        # reconstruct the full symmetric matrix: diagonal tiles were
        # computed in full, strict-upper tiles were never written
        return jnp.tril(C) + jnp.tril(C, -1).T
    return C


def _chunk_plan(offs: np.ndarray, P: int, max_p: int, max_e: int):
    """Pattern-range chunk bounds limited by pattern and element budgets."""
    bounds = [0]
    while bounds[-1] < P:
        p0 = bounds[-1]
        p1 = min(P, p0 + max_p)
        hi = int(np.searchsorted(offs, offs[p0] + max_e, side="right")) - 1
        p1 = max(p0 + 1, min(p1, hi))
        bounds.append(p1)
    return bounds


def all2all_counts(db: KmerPatternDb, chunk: int = _CHUNK) -> np.ndarray:
    """Full symmetric common-k-mer count matrix, uint32[S, S].

    The diagonal holds sample self-counts (the reference only emits the
    strict lower triangle; callers slice what they need).
    """
    S = db.n_samples
    P = db.n_patterns
    if P == 0 or S == 0:
        return np.zeros((S, S), dtype=np.uint32)

    offs = db.pattern_offsets
    sids = db.pattern_sample_ids
    w = db.pattern_num_kmers

    # Tier choice by measured cost model (device_a2a.cost(): env >
    # the costcal machine calibration cache > rig defaults): the host
    # C++ scatter has zero startup while the device tier pays fixed
    # compile/transfer overhead but sustains MXU-rate FLOPs — so small
    # CLI runs stay on host and large databases go to the TPU.
    # KMERDB_A2A_DEVICE=1 forces device, =0 forces host;
    # KMERDB_A2A_PALLAS=0 selects the legacy XLA limb scan instead of
    # the packed Pallas tier (warm-process setups).
    #
    # The host short-circuit runs BEFORE any jax import: a small CLI
    # job must not pay backend init just to decide it stays on host.
    import os
    from ..utils import native
    device_env = os.environ.get("KMERDB_A2A_DEVICE", "")
    want_device = device_env == "1"
    if not want_device and device_env != "0" and native.available:
        from .device_a2a import cost, host_cost_s, device_cost_s
        if host_cost_s(db) >= cost()["fixed_s"]:
            # big enough that the device might win: consult the full
            # model (this is the first point that touches jax); on a
            # TPU host with no calibration cache yet, run the one-time
            # microprobe so the decision uses THIS machine's numbers
            if _on_tpu():
                from . import costcal
                costcal.ensure_calibrated()
                want_device = device_cost_s(db) < host_cost_s(db)
    if want_device and os.environ.get("KMERDB_A2A_PALLAS") != "0":
        from . import device_a2a
        device_a2a.warmup_async()
        try:
            return device_a2a.all2all_device(db)
        except Exception as e:
            from ..utils import log
            log.normal(f"WARNING: packed pallas all2all tier failed, "
                       f"falling back: {e}")
            # the host kernel is the reliable fallback — never route a
            # failed device job onto the slow-compile XLA scan when a
            # working native path exists
            if native.available:
                return native.a2a_dense(offs, sids, w, S)
    if native.available and not want_device:
        return native.a2a_dense(offs, sids, w, S)

    el_pid = db.element_pattern_ids()

    max_w = int(w.max())
    n_limbs = max(1, (max_w.bit_length() + 7) // 8)

    from . import pallas_gram
    from .pallas_gram import on_tpu

    # cap the incidence block (P_pad x S_pad int8) at ~192 MB so
    # wide-sample databases don't blow device memory inside the scan
    S_pad = _round_up(S, pallas_gram.TILE)
    chunk = min(chunk, max(1024, (192 << 20) // S_pad))
    bounds = _chunk_plan(offs, P, chunk, _CHUNK_E)
    n_chunks = len(bounds) - 1
    max_pc = max(bounds[c + 1] - bounds[c] for c in range(n_chunks))
    P_pad = _round_up(max_pc, pallas_gram.KT)

    # host-built 0/1 incidence blocks (anonymous-mmap pages arrive
    # zeroed; only the set bits are written)
    B_all = native.alloc_array(n_chunks * P_pad * S_pad, np.int8,
                               populate=False).reshape(
                                   n_chunks, P_pad, S_pad) \
        if native.available else np.zeros((n_chunks, P_pad, S_pad), np.int8)
    w_all = np.zeros((n_chunks, P_pad), dtype=np.uint32)
    for c in range(n_chunks):
        p0, p1 = bounds[c], bounds[c + 1]
        lo, hi = int(offs[p0]), int(offs[p1])
        rows_c = (el_pid[lo:hi] - p0).astype(np.int32)
        cols_c = np.ascontiguousarray(sids[lo:hi], dtype=np.int32)
        if native.available:
            native.fill_incidence(rows_c, cols_c, B_all[c])
        else:
            B_all[c][rows_c, cols_c] = 1
        w_all[c, :p1 - p0] = w[p0:p1]

    _, jnp = jax_modules()
    args = (jnp.asarray(B_all), jnp.asarray(w_all))
    # Kernel tier choice: on the tunneled bench TPU the XLA limb path
    # measured 81 ms for an 8192x640 chunk set while the Pallas kernels
    # took >500 ms (custom-call dispatch through the relay dominates)
    # and their remote compiles fail intermittently — so XLA is the
    # default device tier.  KMERDB_A2A_PALLAS=1 prefers the fused
    # Pallas kernels (triangle grid then full grid) for
    # directly-attached TPUs; every tier computes the same exact
    # uint32 result, and any tier failure falls through to the next.
    if os.environ.get("KMERDB_A2A_PALLAS") == "1" and on_tpu():
        from ..utils import log
        for tri in (True, False):
            try:
                C = np.asarray(_a2a_scan(*args, n_limbs=n_limbs,
                                         use_pallas=True, triangle=tri))
                return C[:S, :S]
            except Exception as e:
                log.normal(f"WARNING: pallas all2all tier "
                           f"({'triangle' if tri else 'full'}) failed, "
                           f"falling back: {e}")
                continue
    C = np.asarray(_a2a_scan(*args, n_limbs=n_limbs, use_pallas=False))
    return C[:S, :S]


def one2all_counts(db: KmerPatternDb, query_kmers: np.ndarray) -> np.ndarray:
    """uint32[S] common-kmer counts of one query (sorted unique k-mers)
    against every database sample (reference one2all,
    similarity_calculator.cpp:661-925)."""
    S = db.n_samples
    sims = np.zeros(S, dtype=np.uint32)
    if query_kmers.size == 0 or db.n_kmers == 0:
        return sims
    offs = np.ascontiguousarray(db.pattern_offsets, dtype=np.int64)
    from ..utils import native
    if native.available:
        pids = native.one2all_probe(
            np.ascontiguousarray(query_kmers),
            np.ascontiguousarray(db.kmers),
            np.ascontiguousarray(db.kmer_pattern_ids, dtype=np.int32))
        if pids.size == 0:
            return sims
        # run-length count of sorted hit pids (avoids a bincount
        # zeroing n_patterns counters per query)
        nz, counts = _run_length_counts(np.sort(pids))
        native.csr_apply(np.ascontiguousarray(nz), counts, offs,
                         np.ascontiguousarray(db.pattern_sample_ids,
                                              dtype=np.uint32),
                         sims)
        return sims
    idx = np.searchsorted(db.kmers, query_kmers)
    idx[idx >= db.n_kmers] = db.n_kmers - 1
    found = db.kmers[idx] == query_kmers
    pids = db.kmer_pattern_ids[idx[found]]
    pat_counts = np.bincount(pids, minlength=db.n_patterns)
    nz = np.flatnonzero(pat_counts)
    for p in nz:
        cnt = np.uint32(pat_counts[p])
        seg = db.pattern_sample_ids[offs[p]:offs[p + 1]]
        sims[seg] += cnt
    return sims


@functools.lru_cache(maxsize=None)
def _jit_m2a():
    jax, _ = jax_modules()
    return functools.partial(
        jax.jit, static_argnames=("n_limbs", "use_pallas"))(_m2a_scan_impl)


def _m2a_scan(H_all, B_all, *, n_limbs, use_pallas=False):
    return _jit_m2a()(H_all, B_all, n_limbs=n_limbs, use_pallas=use_pallas)


def _m2a_scan_impl(H_all, B_all, *, n_limbs, use_pallas=False):
    """sims = H @ B accumulated over pattern chunks in one dispatch.

    H_all: uint32[n_chunks, Q_pad, P_pad] per-chunk hit counts;
    B_all: int8[n_chunks, P_pad, S_pad] incidence blocks.
    """
    jax, jnp = jax_modules()
    from . import pallas_gram
    H_all = H_all.astype(jnp.uint32)   # u8-packed prepare output
    Q_pad = H_all.shape[1]
    S_pad = B_all.shape[2]
    C0 = jnp.zeros((Q_pad, S_pad), dtype=jnp.uint32)

    if use_pallas:
        def step(C, chunk):
            H, B = chunk
            return C + pallas_gram.matmul_u32(H, B, n_limbs=n_limbs), None
    else:
        def step(C, chunk):
            H, B = chunk
            return C + pallas_gram.matmul_u32_reference(
                H, B, n_limbs=n_limbs), None

    C, _ = jax.lax.scan(step, C0, (H_all, B_all))
    return C


def many2all_counts(db: KmerPatternDb, queries: list[np.ndarray],
                    use_device: bool | None = None) -> np.ndarray:
    """uint32[Q, S]: common-k-mer counts of each query (sorted unique
    k-mer array) against every database sample — the batched form of
    one2all that new2all runs (reference console_new2all.cpp:64-95).

    Device path: per query the hit pattern histogram is built on the
    host (galloping probe), then sims = H @ B runs as exact-uint32
    MXU contractions over pattern chunks.  Host path: per-query CSR
    apply.  Tier default = the measured cost model on the shared
    probe results (both paths pay the probes, so the dispatch sees
    the EXACT host apply workload before choosing);
    KMERDB_N2A_DEVICE=1/0 forces.
    """
    import os
    from ..utils import native
    Q = len(queries)
    S = db.n_samples
    if Q == 0 or S == 0:
        return np.zeros((Q, S), dtype=np.uint32)

    env = os.environ.get("KMERDB_N2A_DEVICE", "")
    probes = None
    if use_device is None:
        use_device = env == "1"
        if env == "" and db.n_patterns and native.available:
            # probe first (both tiers pay it; no jax needed), read the
            # EXACT host apply workload off the probe results, and only
            # touch jax/on_tpu when host work alone exceeds the fixed
            # device overhead — a small CLI job must not pay backend
            # init (or a calibration probe, or the pallas module
            # import) to learn it stays on host
            from .device_a2a import cost
            from . import geom
            c = cost()
            probes = _probe_queries(db, queries)
            lens = np.diff(db.pattern_offsets)
            if S >= 512:
                # pattern-major host apply (what _m2a_host_apply will
                # actually run at this S): per-hit cost is capped by
                # the SIMD row AXPY at ~S/8 units, and the unit rate
                # matches the cache-resident scatter rate (measured
                # 1.8e9 units/s vs host_rate 1.7e9 on the bench rig).
                # The old uncapped estimate modeled the query-major
                # kernel and over-priced the host ~10x, wrongly
                # sending scale jobs to a push-bound device tier.
                cap = np.uint32(max(S // 8, 1))
                apply_ops = float(sum(
                    np.minimum(lens[hp], cap).sum()
                    for hp, _ in probes[0]))
            else:
                apply_ops = float(sum(
                    lens[hp].sum() for hp, _ in probes[0]))
            host_s = apply_ops / c["host_rate"]
            if host_s >= c["fixed_s"]:
                if _on_tpu():
                    from . import costcal
                    c = costcal.ensure_calibrated()
                    host_s = apply_ops / c["host_rate"]
                    TILE, KT = geom.TILE, geom.KT
                    Q_pad = _round_up(Q, TILE)
                    S_pad = _round_up(S, TILE)
                    P_pad = _round_up(db.n_patterns, KT)
                    h_bytes = float(Q_pad) * P_pad * (
                        1 if probes[1] < 256 else 4)
                    b_bytes = float(P_pad) * S_pad
                    flops = 2.0 * Q_pad * P_pad * S_pad
                    dev_s = (c["fixed_s"]
                             + (h_bytes + b_bytes) / c["push_Bps"]
                             + flops / c["dev_flops"]
                             + Q * S * 4 / c["pull_Bps"])
                    use_device = dev_s < host_s
    if not use_device or db.n_patterns == 0 or not native.available:
        if probes is not None:
            return _m2a_host_apply(db, probes[0], S)
        if native.available and db.n_patterns:
            # forced-host (KMERDB_N2A_DEVICE=0) must still take the
            # batched probe + pattern-major apply — the per-query
            # one2all loop below is the no-native fallback only
            # (measured 21 s vs 2.5 s on the 256x4096 case)
            return _m2a_host_apply(db, _probe_queries(db, queries)[0], S)
        return np.stack([one2all_counts(db, q) for q in queries])

    H_all, B_all, n_limbs = m2a_prepare(db, queries, probes=probes)
    # Mosaic-first chunk loop on TPU (no XLA dot programs on the hot
    # path — see ops/device_a2a module doc); KMERDB_A2A_PALLAS=0
    # selects the legacy XLA limb scan (warm-process setups), which is
    # also the off-TPU default — the Pallas interpreter would emulate
    # every MXU tile in software there
    pallas_env = os.environ.get("KMERDB_A2A_PALLAS")
    if pallas_env != "0" and (_on_tpu() or pallas_env == "1"):
        from ..utils import log
        try:
            return _m2a_device_mosaic(H_all, B_all, n_limbs)[:Q, :S]
        except Exception as e:
            log.normal(f"WARNING: mosaic new2all tier failed, "
                       f"falling back: {e}")
    _, jnp = jax_modules()
    args = (jnp.asarray(H_all), jnp.asarray(B_all))
    C = np.asarray(_m2a_scan(*args, n_limbs=n_limbs, use_pallas=False))
    return C[:Q, :S]


@functools.lru_cache(maxsize=None)
def _jit_m2a_acc(n_limbs: int, interpret: bool):
    jax, _ = jax_modules()
    from . import pallas_gram

    def step(H, B, C):
        return pallas_gram.matmul_u32_acc(H, B, C, n_limbs=n_limbs,
                                          interpret=interpret)

    return jax.jit(step, donate_argnums=(2,))


def _m2a_device_mosaic(H_all, B_all, n_limbs):
    """sims = H @ B accumulated chunk-by-chunk through the aliased
    Mosaic kernel; C stays on device and is pulled once."""
    import jax
    from . import pallas_gram
    jax, jnp = jax_modules()
    n_chunks, Q_pad, P_pad = H_all.shape
    S_pad = B_all.shape[2]
    interp = not pallas_gram.on_tpu()
    # lower with H's ACTUAL dtype: m2a_prepare emits uint8 H when
    # n_limbs == 1 (the common case) and uint32 otherwise; a uint32
    # lowering would make the compiled executable reject every 1-limb
    # call ("Argument types differ") and silently fall back
    from . import device_a2a
    ex = device_a2a.aot_compile(
        ("m2a_acc", n_limbs, interp, str(np.dtype(H_all.dtype))),
        _jit_m2a_acc(n_limbs, interp),
        jax.ShapeDtypeStruct((Q_pad, P_pad), jnp.dtype(H_all.dtype)),
        jax.ShapeDtypeStruct((P_pad, S_pad), jnp.int8),
        jax.ShapeDtypeStruct((Q_pad, S_pad), jnp.uint32))
    C = jax.device_put(np.zeros((Q_pad, S_pad), dtype=np.uint32))
    for c in range(n_chunks):
        C = ex(jax.device_put(H_all[c]), jax.device_put(B_all[c]), C)
    return np.asarray(C)


class _ProbeList(list):
    """Per-query (hit_pids, counts) pairs, plus the flat batched-probe
    arrays (`flat`) that let the host apply run as ONE threaded native
    call instead of a Python loop."""
    flat = None


def _probe_queries(db: KmerPatternDb, queries: list[np.ndarray]):
    """Probe every query against the database k-mer array:
    ([(hit_pids, counts)], max_count) — the shared host stage of BOTH
    many2all tiers (the dispatch cost model reads the exact apply
    workload from it before committing to a tier).

    Native path: ONE bucketed multi-query intersect (the db array
    streams from RAM once for the whole batch, key ranges fan out
    across threads — the role of the reference's per-query pool
    threads, console_new2all.cpp:64-95)."""
    from ..utils import native
    kmers = np.ascontiguousarray(db.kmers)
    pids32 = np.ascontiguousarray(db.kmer_pattern_ids, dtype=np.int32)
    probes = _ProbeList()
    if native.available and len(queries) > 1:
        hp, hc, qoffs, ucnt, max_c = native.many2all_probe(
            queries, kmers, pids32, db.n_patterns)
        for q in range(len(queries)):
            o = int(qoffs[q])
            u = int(ucnt[q])
            probes.append((hp[o:o + u], hc[o:o + u]))
        probes.flat = (hp, hc, qoffs, ucnt)
        return probes, max_c
    max_c = 1
    for q in queries:
        hit = np.sort(native.one2all_probe(
            np.ascontiguousarray(q), kmers, pids32)) \
            if native.available else _probe_fallback(db, q)
        hp, cnts = _run_length_counts(hit)
        probes.append((hp, cnts))
        if cnts.size:
            max_c = max(max_c, int(cnts.max()))
    return probes, max_c


def _probe_fallback(db: KmerPatternDb, q: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(db.kmers, q)
    idx[idx >= db.n_kmers] = db.n_kmers - 1
    found = db.kmers[idx] == q
    return np.sort(db.kmer_pattern_ids[idx[found]])


def _m2a_host_apply(db: KmerPatternDb, probes, S: int) -> np.ndarray:
    """Host CSR apply of pre-computed probe results (the one2all_counts
    tail, reusing probes the tier dispatch already paid for)."""
    from ..utils import native
    offs = np.ascontiguousarray(db.pattern_offsets, dtype=np.int64)
    sids = np.ascontiguousarray(db.pattern_sample_ids, dtype=np.uint32)
    flat = getattr(probes, "flat", None)
    if flat is not None and native.available:
        out = native.alloc_array(len(probes) * S, np.uint32).reshape(
            len(probes), S)
        hp, hc, qoffs, ucnt = flat
        # pattern-major for wide sample axes: each hit pattern's sample
        # list is read once for the whole batch and dense patterns
        # apply as SIMD row AXPYs (query-major re-reads lists per query
        # — 21 s of a 24 s scale new2all on the 256x4096 case; 2 s
        # pattern-major).  At small S the AXPY never engages and the
        # hit transpose is pure overhead (128-sample corpus: 0.38 s
        # query-major vs 1.1 s pattern-major), so query-major keeps
        # the narrow shapes.  KMERDB_APPLY=qmajor/pmajor forces.
        mode = os.environ.get("KMERDB_APPLY", "")
        if mode == "qmajor" or (S < 512 and mode != "pmajor"):
            native.csr_apply_many(qoffs, ucnt, hp, hc, offs, sids, out)
        else:
            native.csr_apply_patmajor(qoffs, ucnt, hp, hc, offs, sids,
                                      db.n_patterns, out)
        return out
    out = np.zeros((len(probes), S), dtype=np.uint32)
    for i, (hp, cnts) in enumerate(probes):
        if hp.size:
            native.csr_apply(np.ascontiguousarray(hp, dtype=np.int64),
                             np.ascontiguousarray(cnts, dtype=np.uint32),
                             offs, sids, out[i])
    return out


def m2a_prepare(db: KmerPatternDb, queries: list[np.ndarray],
                q_align: int | None = None, probes=None):
    """Host prep for the batched query contraction sims = H @ B.

    Returns (H_all uint32[n_chunks, Q_pad, P_pad] per-chunk hit
    counts, B_all int8[n_chunks, P_pad, S_pad] incidence blocks,
    n_limbs).  q_align overrides the Q padding multiple (a mesh shards
    the query axis); probes forwards _probe_queries output when the
    caller already ran it."""
    from ..utils import native
    from . import geom
    Q = len(queries)
    S = db.n_samples

    if probes is None:
        probes = _probe_queries(db, queries)
    probes, max_c = probes
    n_limbs = max(1, (max_c.bit_length() + 7) // 8)

    offs = db.pattern_offsets
    sids = db.pattern_sample_ids
    el_pid = db.element_pattern_ids()
    P = db.n_patterns
    TILE, KT = geom.TILE, geom.KT
    Q_pad = _round_up(Q, q_align or TILE)
    S_pad = _round_up(S, TILE)
    chunk = min(_CHUNK, max(KT, (64 << 20) // max(S_pad, Q_pad)))
    bounds = _chunk_plan(offs, P, chunk, _CHUNK_E)
    n_chunks = len(bounds) - 1
    max_pc = max(bounds[c + 1] - bounds[c] for c in range(n_chunks))
    P_pad = _round_up(max_pc, KT)

    B_all = native.alloc_array(n_chunks * P_pad * S_pad, np.int8,
                               populate=False).reshape(
                                   n_chunks, P_pad, S_pad)
    # single-limb hit counts fit u8, quartering the device push
    h_dtype = np.uint8 if n_limbs == 1 else np.uint32
    H_all = native.alloc_array(
        n_chunks * Q_pad * P_pad * np.dtype(h_dtype).itemsize, np.uint8,
        populate=False).view(h_dtype).reshape(n_chunks, Q_pad, P_pad)
    for c in range(n_chunks):
        p0, p1 = bounds[c], bounds[c + 1]
        lo, hi = int(offs[p0]), int(offs[p1])
        native.fill_incidence(
            (el_pid[lo:hi] - p0).astype(np.int32),
            np.ascontiguousarray(sids[lo:hi], dtype=np.int32), B_all[c])
        for qi, (hp, hc) in enumerate(probes):
            j0, j1 = np.searchsorted(hp, [p0, p1])
            H_all[c, qi, hp[j0:j1] - p0] = hc[j0:j1]
    return H_all, B_all, n_limbs


def d2d_pairs(db_row: KmerPatternDb, db_col: KmerPatternDb):
    """Intersect the two sorted k-mer arrays and run-length-count the
    matched (pid1, pid2) pattern pairs: returns (up1, up2, counts) or
    None when the databases share no k-mers."""
    from ..utils import native
    if db_row.n_kmers == 0 or db_col.n_kmers == 0:
        return None
    if native.available:
        p1, p2 = native.intersect_probe(
            np.ascontiguousarray(db_row.kmers),
            np.ascontiguousarray(db_row.kmer_pattern_ids, dtype=np.int32),
            np.ascontiguousarray(db_col.kmers),
            np.ascontiguousarray(db_col.kmer_pattern_ids, dtype=np.int32))
    else:
        idx = np.searchsorted(db_col.kmers, db_row.kmers)
        idx[idx >= db_col.n_kmers] = db_col.n_kmers - 1
        found = db_col.kmers[idx] == db_row.kmers
        p1 = db_row.kmer_pattern_ids[found]
        p2 = db_col.kmer_pattern_ids[idx[found]]
    if p1.size == 0:
        return None
    pair = p1.astype(np.int64) * db_col.n_patterns + p2.astype(np.int64)
    pair.sort(kind="stable")
    upair, cnts = _run_length_counts(pair)
    up1 = (upair // db_col.n_patterns).astype(np.int64)
    up2 = (upair % db_col.n_patterns).astype(np.int64)
    return up1, up2, np.ascontiguousarray(cnts, dtype=np.uint32)


def db2db_counts(db_row: KmerPatternDb, db_col: KmerPatternDb) -> np.ndarray:
    """uint32[S_row, S_col] cross-database common-k-mer counts
    (reference db2db_sp, similarity_calculator.cpp:1225-1540).

    Sorted-merge intersection of the two k-mer arrays -> (pid1, pid2)
    match counts M, then C = B1^T M B2 applied through the CSRs.
    """
    from ..utils import native
    S1, S2 = db_row.n_samples, db_col.n_samples
    C = np.zeros((S1, S2), dtype=np.uint32)
    pairs = d2d_pairs(db_row, db_col)
    if pairs is None:
        return C
    up1, up2, cnts = pairs

    # device tier: pattern-pair chunks contracted on the MXU as
    # C = U^T diag(counts) V via the packed Mosaic cross kernel.
    # Dispatch = the measured cost model on the EXACT pair workload
    # (d2d_pairs already ran, so both sides' work is known);
    # KMERDB_D2D_DEVICE=1/0 forces.  Off-TPU the Pallas interpreter
    # would emulate the MXU in software, so the device tier engages
    # only on TPU (or with KMERDB_A2A_PALLAS=1 for the interpret-mode
    # test path).
    import os
    env = os.environ.get("KMERDB_D2D_DEVICE", "")
    want_device = env == "1"
    if env == "" and native.available:
        # exact host work (one |rows| x |cols| scatter per pair) is
        # known from the pair list alone — compute it BEFORE touching
        # jax, and only consult on_tpu/calibration when host work
        # exceeds the fixed device overhead
        from .device_a2a import cost
        c = cost()
        l1 = np.diff(db_row.pattern_offsets)[up1].astype(np.float64)
        l2 = np.diff(db_col.pattern_offsets)[up2].astype(np.float64)
        host_ops = float(l1 @ l2)

        def _host_s(cc):
            return host_ops / (cc["host_rate"] if max(S1, S2) <= 1024
                               else cc["host_rate_big"])

        if _host_s(c) >= c["fixed_s"]:
            if _on_tpu():
                from . import costcal
                from .device_a2a import _geometry
                c = costcal.ensure_calibrated()
                _, KT, TILE = _geometry(min(S1, S2))
                S1_pad = _round_up(S1, TILE)
                S2_pad = _round_up(S2, TILE)
                rows = _round_up(up1.size, KT)
                push = rows / 8 * (S1_pad + S2_pad)
                flops = 2.0 * rows * S1_pad * S2_pad
                dev_s = (c["fixed_s"] + push / c["push_Bps"]
                         + push / c["fill_Bps"]
                         + flops / c["dev_flops"]
                         + S1 * S2 * 4 / c["pull_Bps"])
                want_device = dev_s < _host_s(c)
    if want_device and native.available:
        if _on_tpu() or os.environ.get("KMERDB_A2A_PALLAS") == "1":
            return _d2d_device(db_row, db_col, up1, up2,
                               np.ascontiguousarray(cnts, dtype=np.uint32))

    o1 = np.ascontiguousarray(db_row.pattern_offsets, dtype=np.int64)
    s1 = np.ascontiguousarray(db_row.pattern_sample_ids, dtype=np.uint32)
    o2 = np.ascontiguousarray(db_col.pattern_offsets, dtype=np.int64)
    s2 = np.ascontiguousarray(db_col.pattern_sample_ids, dtype=np.uint32)
    from ..utils import native
    if native.available:
        native.cross_apply(up1, up2,
                           np.ascontiguousarray(cnts, dtype=np.uint32),
                           o1, s1, o2, s2, C)
        return C
    for a, b, cnt in zip(up1, up2, cnts):
        rows = s1[o1[a]:o1[a + 1]]
        cols = s2[o2[b]:o2[b + 1]]
        C[np.ix_(rows, cols)] += np.uint32(cnt)
    return C
