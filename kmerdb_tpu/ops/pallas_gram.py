"""Pallas TPU kernel: exact uint32 weighted Gram contraction.

The flagship all2all decomposition (SURVEY §3.2, reference
similarity_calculator.cpp:42-438) reduces to

    C = B^T diag(w) B      C uint32[S, S], B in {0,1}^(P x S), w uint32[P]

The XLA path (ops/intersect.py) runs one bf16 matmul per 8-bit limb of
w, materializing the scaled operand A = B * w_l in HBM each time.  This
kernel fuses all limbs over one pass of B tiles: for each output tile
(i, j) it streams K-blocks of B once, computes every limb's MXU product
from the same VMEM-resident blocks, and accumulates exactly in uint32.

Exactness: b entries are 0/1 and limb weights < 2^8, both exact in
bfloat16; each K-block partial sum is < 2^8 * KT << 2^24, so float32
MXU accumulation is exact; uint32 addition across K-blocks and limb
recombination (<< 8l) match the reference's num_kmers_t wraparound
arithmetic (src/types.h:5-27).
"""

import functools

import numpy as np

from .._jaxinit import jax_modules

jax, jnp = jax_modules()  # configures x64 + compile cache
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# geometry constants + per-machine autotuned tile-rate tables live in
# ops/geom.py (importable without pallas); re-exported here for the
# kernel call sites and backwards compatibility
from .geom import KT, TILE, KT_S8, TILE_S8, pick_tile  # noqa: F401


def on_tpu() -> bool:
    """True when the default JAX device is a TPU chip (including
    tunneled platforms like 'axon' whose platform name isn't 'tpu').

    Bounded: the first call in a process consults utils/hwprobe (a
    cross-process stamp + timeout-guarded subprocess probe) before
    initializing the backend, because init against a deaf tunneled
    service blocks indefinitely — a down service must cost a bounded
    probe, not a hung CLI.  KMERDB_HW_PROBE=0 restores the direct
    init."""
    from ..utils import hwprobe
    return hwprobe.tpu_available()


def _gram_body(k, w_ref, bi_ref, bj_ref, out_ref, n_limbs):
    """Shared Gram tile body: out += sum_l (Bi*w_l)^T Bj << 8l, with
    out zero-initialized on the first K step (k is the position along
    the reduction grid axis — axis 2 for the full grid, axis 1 for the
    triangle grid)."""
    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:]              # (KT, 1) uint32
    # B arrives as int8 0/1; Mosaic has no direct u32/i8 <-> bf16
    # casts, so hop via int32/float32
    bi = bi_ref[:].astype(jnp.float32).astype(jnp.bfloat16)
    bj = bj_ref[:].astype(jnp.float32).astype(jnp.bfloat16)
    acc = jnp.zeros(out_ref.shape, jnp.uint32)
    for l in range(n_limbs):
        wl = ((w >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(
            jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            bi * wl, bj,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + (part.astype(jnp.int32).astype(jnp.uint32)
                     << np.uint32(8 * l))
    out_ref[:] += acc


def _gram_tile_kernel(w_ref, bi_ref, bj_ref, out_ref, *, n_limbs):
    """One (i, j, k) grid step of the full Gram grid."""
    _gram_body(pl.program_id(2), w_ref, bi_ref, bj_ref, out_ref, n_limbs)


def gram_u32(B, w, *, n_limbs: int, interpret: bool | None = None):
    """C = B^T diag(w) B in exact uint32.

    B: int8 0/1 [P, S] with P % KT == 0 and S % TILE == 0 (caller pads;
    pad rows must carry w == 0).  w: uint32[P, 1].  Returns u32[S, S].
    Runs compiled on TPU; elsewhere (CPU test backend) falls back to
    the Pallas interpreter so the same kernel code is exercised.
    """
    if interpret is None:
        interpret = not on_tpu()
    P, S = B.shape
    grid = (S // TILE, S // TILE, P // KT)
    kernel = functools.partial(_gram_tile_kernel, n_limbs=n_limbs)
    # Mosaic cannot legalize the i64 scalars that x64 tracing injects
    # into the grid pipeline ("failed to legalize func.return (i32,
    # i64)"), so the kernel must be traced in 32-bit mode; every
    # operand dtype here is <= 32 bits, so semantics are unchanged.
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((KT, 1), lambda i, j, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KT, TILE), lambda i, j, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KT, TILE), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, S), jnp.uint32),
            interpret=interpret,
        )(w, B, B)


def gram_u32_tri(B, w, *, n_limbs: int, interpret: bool | None = None):
    """Lower-triangle-only weighted Gram: computes C tiles with
    tile_row >= tile_col over a compacted 1-D tile enumeration, halving
    both MXU work and B-tile DMA versus the full grid.  The (i, j)
    coordinates of the t-th triangle tile come from scalar-prefetched
    index tables (PrefetchScalarGridSpec) — data-dependent block
    indexing the Mosaic way.  Upper-triangle tiles of the output are
    UNINITIALIZED — the caller must reconstruct
    C_full = tril(C) + tril(C, -1)^T (the diagonal tiles are computed
    in full, so their upper-in-tile cells are already correct)."""
    if interpret is None:
        interpret = not on_tpu()
    P, S = B.shape
    nt = S // TILE
    n_tri = nt * (nt + 1) // 2
    i_tab = np.repeat(np.arange(nt, dtype=np.int32),
                      np.arange(1, nt + 1))
    j_tab = np.concatenate([np.arange(i + 1, dtype=np.int32)
                            for i in range(nt)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tri, P // KT),
        in_specs=[
            pl.BlockSpec((KT, 1), lambda t, k, it, jt: (k, 0)),
            pl.BlockSpec((KT, TILE), lambda t, k, it, jt: (k, it[t])),
            pl.BlockSpec((KT, TILE), lambda t, k, it, jt: (k, jt[t])),
        ],
        out_specs=pl.BlockSpec((TILE, TILE),
                               lambda t, k, it, jt: (it[t], jt[t])),
    )
    kernel = functools.partial(_gram_tile_tri_kernel, n_limbs=n_limbs)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, S), jnp.uint32),
            interpret=interpret,
        )(jnp.asarray(i_tab), jnp.asarray(j_tab), w, B, B)


def _gram_tile_tri_kernel(it_ref, jt_ref, w_ref, bi_ref, bj_ref, out_ref,
                          *, n_limbs):
    """One (t, k) grid step of the triangle grid; it_ref/jt_ref are the
    scalar-prefetched tile-coordinate tables (consumed by the index
    maps, unused in the body)."""
    _gram_body(pl.program_id(1), w_ref, bi_ref, bj_ref, out_ref, n_limbs)


def _unpack_pk(bp):
    """(KT//8, TILE) uint8 packed bits -> (KT, TILE) bfloat16 0/1.

    Bit b of byte-row k holds pattern 8k + b; the concat emits rows in
    b-major order (concat-row b*(KT//8) + k), so callers must permute
    the weight vector identically (w.reshape(-1, KT//8, 8)
    .transpose(0, 2, 1)).  Packing along the pattern (sublane) axis
    keeps the lane dimension at TILE=128 — packing along samples would
    leave 16-byte lanes, which Mosaic relayouts poorly."""
    b32 = bp.astype(jnp.int32)
    rows = [((b32 >> b) & 1) for b in range(8)]
    return jnp.concatenate(rows, axis=0).astype(
        jnp.float32).astype(jnp.bfloat16)


def _gram_pk_tri_kernel(it_ref, jt_ref, w_ref, bpi_ref, bpj_ref, c_ref,
                        out_ref, *, n_limbs, engine="bf16"):
    """One (t, k) step of the packed triangle Gram with C accumulation.

    c_ref is the running C tile (aliased to out_ref's buffer): the
    kernel computes out = C_in + sum_k sum_l (Bi*w_l)^T Bj << limb for
    this output tile, keeping the whole group update inside one Mosaic
    program — no XLA unpack or accumulate programs (their remote
    compiles are the latency hazard on tunneled TPU rigs)."""
    _PK_BODIES[engine](pl.program_id(1), w_ref, bpi_ref, bpj_ref, c_ref,
                       out_ref, n_limbs)


def gram_u32_pk_tri(Bp, w, C, *, n_limbs: int,
                    interpret: bool | None = None,
                    kt: int | None = None, tile: int | None = None,
                    engine: str = "bf16"):
    """C + Bp^T-packed triangle Gram, everything in one Mosaic program.

    Bp: uint8[P//8, S] bit-packed incidence — bit b of row k is pattern
    8k + b (see _unpack_pk).  w: uint32[P, 1] pattern weights PERMUTED
    to b-major block order.  C: uint32[S, S] running accumulator; the
    output aliases C's buffer (donated).  P % KT == 0, S % TILE == 0.
    Only tiles with tile_row >= tile_col are updated; strict-upper
    tiles pass through C's previous contents.

    kt/tile override the K-block and output-tile edges (tuning knobs;
    exactness needs 255 * kt < 2^24 for bf16 and S % tile == 0,
    P % kt == 0; the caller's pk_weight_order must use the same kt).
    engine picks the limb body: "bf16" (8-bit limbs, f32 MXU) or "s8"
    (7-bit limbs, int8 MXU — see _gram_pk_body_s8).

    Geometry sweeps on the v5e (tools/kernel_sweep.py, 2026-08-17,
    P=1M, S=2048, 1 limb): the round-2 bf16 kt<=1024 x tile=128 plateau
    is ~9 TFLOPS set by a fixed ~600 ns/grid-step cost, NOT by the
    unpack (a two-stage unpacked variant was 16x more DMA and slower);
    growing the tile amortizes the step cost — bf16 tile=256 hits 65,
    kt=1024 88; the s8 engine at kt=1024 x tile=512 sustains ~219
    TFLOPS (56% of the 394-TFLOP int8 MXU peak).
    """
    if interpret is None:
        interpret = not on_tpu()
    kt = kt or KT
    tile = tile or TILE
    Pb, S = Bp.shape
    P = Pb * 8
    nt = S // tile
    n_tri = nt * (nt + 1) // 2
    i_tab, j_tab = tri_tile_tables(nt)
    KB = kt // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tri, P // kt),
        in_specs=[
            pl.BlockSpec((kt, 1), lambda t, k, it, jt: (k, 0)),
            pl.BlockSpec((KB, tile), lambda t, k, it, jt: (k, it[t])),
            pl.BlockSpec((KB, tile), lambda t, k, it, jt: (k, jt[t])),
            pl.BlockSpec((tile, tile),
                         lambda t, k, it, jt: (it[t], jt[t])),
        ],
        out_specs=pl.BlockSpec((tile, tile),
                               lambda t, k, it, jt: (it[t], jt[t])),
    )
    kernel = functools.partial(_gram_pk_tri_kernel, n_limbs=n_limbs,
                               engine=engine)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, S), jnp.uint32),
            input_output_aliases={5: 0},
            interpret=interpret,
        )(jnp.asarray(i_tab), jnp.asarray(j_tab), w, Bp, Bp, C)


def pk_weight_order(w: np.ndarray, kt: int | None = None) -> np.ndarray:
    """Permute pattern weights to the b-major order _unpack_pk emits
    (w.size % kt == 0)."""
    kt = kt or KT
    return np.ascontiguousarray(
        w.reshape(-1, kt // 8, 8).transpose(0, 2, 1).reshape(-1))


def _gram_pk_rect_kernel(rt0_ref, w_ref, bpi_ref, bpj_ref, c_ref,
                         out_ref, *, n_limbs, engine="bf16"):
    """One (i, j, k) step of the row-stripe rectangle grid: the output
    stripe covers global row tiles [rt0, rt0 + nrt); rt0 arrives as a
    scalar-prefetch arg so every stripe of equal geometry shares ONE
    compiled program (compiles are the scarce resource on tunneled
    rigs)."""
    _PK_BODIES[engine](pl.program_id(2), w_ref, bpi_ref, bpj_ref, c_ref,
                       out_ref, n_limbs)


def _gram_pk_body(k, w_ref, bpi_ref, bpj_ref, c_ref, out_ref, n_limbs):
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]

    w = w_ref[:]
    bi = _unpack_pk(bpi_ref[:])
    bj = _unpack_pk(bpj_ref[:])
    acc = jnp.zeros(out_ref.shape, jnp.uint32)
    for l in range(n_limbs):
        wl = ((w >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(
            jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            bi * wl, bj,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + (part.astype(jnp.int32).astype(jnp.uint32)
                     << np.uint32(8 * l))
    out_ref[:] += acc


def _gram_pk_body_s8(k, w_ref, bpi_ref, bpj_ref, c_ref, out_ref,
                     n_limbs):
    """int8 engine of the packed Gram step: per 7-bit weight limb the
    lhs is (bit * w_l) as int8 (products <= 127, K-block partials
    <= 127 * kt, exact in the MXU's int32 accumulator — no bf16 hop,
    2x the bf16 MXU rate on v5e) and the rhs is the 0/1 bits as int8.
    Recombination out += part << 7l in uint32 keeps the reference's
    num_kmers_t mod-2^32 contract (src/types.h:5-27).  w must be in
    the same b-major pk_weight_order as the bf16 engine."""
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]

    w = w_ref[:]
    b32i = bpi_ref[:].astype(jnp.int32)
    rows_i = jnp.concatenate([((b32i >> b) & 1) for b in range(8)],
                             axis=0)                     # (kt, tile) i32
    b32j = bpj_ref[:].astype(jnp.int32)
    bj = jnp.concatenate([((b32j >> b) & 1) for b in range(8)],
                         axis=0).astype(jnp.int8)
    acc = jnp.zeros(out_ref.shape, jnp.uint32)
    for l in range(n_limbs):
        wl = ((w >> np.uint32(7 * l)) & np.uint32(0x7F)).astype(
            jnp.int32)
        bi = (rows_i * wl).astype(jnp.int8)
        part = jax.lax.dot_general(
            bi, bj, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + (part.astype(jnp.uint32) << np.uint32(7 * l))
    out_ref[:] += acc


_PK_BODIES = {"bf16": _gram_pk_body, "s8": _gram_pk_body_s8}

#: weight bits covered per limb, by engine
from .geom import LIMB_BITS  # noqa: F401,E402


def gram_u32_pk_rows(Bp, w, C_stripe, rt0: int, *, n_limbs: int,
                     interpret: bool | None = None,
                     kt: int | None = None, tile: int | None = None,
                     engine: str = "bf16"):
    """Row-stripe of the packed Gram: C_stripe + (B^T diag(w) B)[R, :]
    where R covers global row tiles [rt0, rt0 + nrt) — the large-S
    output tiling (stream stripes to the CSV writer; C never fully
    materializes on device).  Bp/w as in gram_u32_pk_tri; C_stripe:
    uint32[nrt*tile, S] aliased to the output; rt0 counts tiles of the
    SAME tile edge.  Computes the full rectangle (including j > i
    cells, discarded by the caller): ~2x the triangle FLOPs buys one
    shared compiled program for every stripe, which wins whenever
    compiles cost seconds and the MXU has headroom.  kt/tile/engine as
    in gram_u32_pk_tri."""
    if interpret is None:
        interpret = not on_tpu()
    kt = kt or KT
    tile = tile or TILE
    Pb, S = Bp.shape
    P = Pb * 8
    R, _ = C_stripe.shape
    nrt = R // tile
    nct = S // tile
    KB = kt // 8
    rt0_arr = (np.array([rt0], dtype=np.int32)
               if isinstance(rt0, int) else rt0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrt, nct, P // kt),
        in_specs=[
            pl.BlockSpec((kt, 1), lambda i, j, k, rt0: (k, 0)),
            pl.BlockSpec((KB, tile), lambda i, j, k, rt0: (k, rt0[0] + i)),
            pl.BlockSpec((KB, tile), lambda i, j, k, rt0: (k, j)),
            pl.BlockSpec((tile, tile), lambda i, j, k, rt0: (i, j)),
        ],
        out_specs=pl.BlockSpec((tile, tile),
                               lambda i, j, k, rt0: (i, j)),
    )
    kernel = functools.partial(_gram_pk_rect_kernel, n_limbs=n_limbs,
                               engine=engine)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, S), jnp.uint32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )(jnp.asarray(rt0_arr), w, Bp, Bp, C_stripe)


def _pack_tiles_kernel(it_ref, jt_ref, c_ref, out_ref):
    out_ref[:] = c_ref[:][None].astype(out_ref.dtype)


def tril_tiles(C, *, interpret: bool | None = None, dtype=None):
    """Gather the lower-tile-triangle of C into [n_tri, TILE, TILE].

    The obvious XLA searchsorted+gather pack program hits the remote
    compiler's slow path (25-380 s observed); this Mosaic copy kernel
    compiles in ~0.5 s and pulls ~half the bytes of the full matrix.
    Tile t of the output is C tile (i_tab[t], j_tab[t]) — the same
    enumeration gram_u32_tri uses; hosts rebuild the symmetric matrix
    by placing each tile at (i, j) and its transpose at (j, i).

    dtype narrows the pulled cells (uint16 when every count is known
    < 2^16 — C[i,j] <= min(sample kmer counts) — halving the pull on
    slow device->host links).
    """
    if interpret is None:
        interpret = not on_tpu()
    S = C.shape[0]
    nt = S // TILE
    n_tri = nt * (nt + 1) // 2
    i_tab, j_tab = tri_tile_tables(nt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tri,),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda t, it, jt: (it[t], jt[t])),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE),
                               lambda t, it, jt: (t, 0, 0)),
    )
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _pack_tiles_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tri, TILE, TILE),
                                           dtype or C.dtype),
            interpret=interpret,
        )(jnp.asarray(i_tab), jnp.asarray(j_tab), C)


def _filter_colsum_kernel(b_ref, c_ref, out_ref):
    """Per (row-tile, column) survivor counts of the bound filter
    lo <= c <= hi.  Bounds arrive bias-encoded (u32 ^ 0x80000000 as
    i32) so the full uint32 count range compares correctly through
    SMEM's int32 scalars."""
    blk = (c_ref[:] ^ np.uint32(0x80000000)).astype(jnp.int32)
    keep = (blk >= b_ref[0]) & (blk <= b_ref[1])
    # reduce in int32: Mosaic has no unsigned reductions ("Reductions
    # over unsigned integers not implemented" on real TPU — the
    # interpreter accepts u32, so only hardware runs catch it); the
    # tile count <= 128 fits either way
    s = jnp.sum(keep.astype(jnp.int32), axis=0, keepdims=True)
    out_ref[:] = s.astype(jnp.uint32)


def bias_bounds(lo: int, hi: int) -> np.ndarray:
    """Encode inclusive uint32 bounds for filter_colsum's int32 SMEM
    scalars (biased so signed compare == unsigned compare)."""
    return (np.array([lo, hi], dtype=np.uint32)
            ^ np.uint32(0x80000000)).astype(np.int32)


def filter_colsum(C, bounds, *, interpret: bool | None = None):
    """u32[R//128, S]: for each 128-row tile, how many cells of each
    column survive the inclusive uint32 bounds (pre-encoded via
    bias_bounds -> int32[2]).  The compact-at-source role of
    SparseMatrix::compact2 (reference src/array.h:392-446): the filter
    runs ON DEVICE so the host can pull only surviving tiles instead
    of dense stripes.  One compiled program serves every bound value
    (scalar prefetch)."""
    if interpret is None:
        interpret = not on_tpu()
    R, S = C.shape
    cw = 2048 if S % 2048 == 0 else TILE
    b = bounds
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // TILE, S // cw),
        in_specs=[pl.BlockSpec((TILE, cw), lambda i, j, b: (i, j))],
        out_specs=pl.BlockSpec((1, cw), lambda i, j, b: (i, j)),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            _filter_colsum_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R // TILE, S), jnp.uint32),
            interpret=interpret,
        )(jnp.asarray(b), C)


def gather_tiles(C, i_tab, j_tab, *, dtype=None,
                 interpret: bool | None = None):
    """Gather arbitrary (i_tab[t], j_tab[t]) 128x128 tiles of C into
    [n, 128, 128] — tril_tiles with caller-chosen tables: the sparse
    pull ships only survivor-bearing tiles (dtype narrows them, e.g.
    uint16).  n is the caller's padding bucket (repeat tile (0, 0))."""
    if interpret is None:
        interpret = not on_tpu()
    n = int(len(i_tab))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda t, it, jt: (it[t], jt[t])),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE),
                               lambda t, it, jt: (t, 0, 0)),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            _pack_tiles_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, TILE, TILE),
                                           dtype or C.dtype),
            interpret=interpret,
        )(jnp.asarray(i_tab, dtype=jnp.int32),
          jnp.asarray(j_tab, dtype=jnp.int32), C)


def _bounds_zero_kernel(b_ref, c_ref, out_ref):
    c = c_ref[:]
    # biased compare: signed int32 order == unsigned uint32 order
    biased = (c ^ np.uint32(0x80000000)).astype(jnp.int32)
    keep = (biased >= b_ref[0]) & (biased <= b_ref[1])
    out_ref[:] = jnp.where(keep, c, 0).astype(out_ref.dtype)


def bounds_zero_rows(C, bounds, *, dtype=None,
                     interpret: bool | None = None):
    """Elementwise inclusive-uint32-bounds filter: cells outside
    [lo, hi] (pre-encoded via bias_bounds -> int32[2]) become 0, with
    an optional narrowing cast fused in.  The device-side filter
    pushdown of the sharded streamed-sparse path (the mesh twin of
    filter_colsum + survivor gather): non-survivors are zeroed BEFORE
    the stripe leaves the device.  One compiled program serves every
    bound value (scalar prefetch)."""
    if interpret is None:
        interpret = not on_tpu()
    R, S = C.shape
    cw = 2048 if S % 2048 == 0 else TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // TILE, S // cw),
        in_specs=[pl.BlockSpec((TILE, cw), lambda i, j, b: (i, j))],
        out_specs=pl.BlockSpec((TILE, cw), lambda i, j, b: (i, j)),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            _bounds_zero_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, S), dtype or C.dtype),
            interpret=interpret,
        )(jnp.asarray(bounds), C)


def _cast_rows_kernel(c_ref, out_ref):
    out_ref[:] = c_ref[:].astype(out_ref.dtype)


def cast_rows(C, dtype, *, interpret: bool | None = None):
    """Mosaic elementwise dtype cast of a row-major matrix (the
    streamed stripe pull's u32 -> u16 narrowing; an XLA convert would
    risk the slow-compile lottery).  Column-tiled so wide matrices
    stay within VMEM (a (128, 16384) u32+u16 block pair is 24 MB)."""
    if interpret is None:
        interpret = not on_tpu()
    R, S = C.shape
    # cw must DIVIDE S or the tail columns are never written; S is a
    # multiple of TILE, so a TILE-wide column block always works and
    # stays far under VMEM
    cw = 2048 if S % 2048 == 0 else TILE
    with jax.enable_x64(False):
        return pl.pallas_call(
            _cast_rows_kernel,
            grid=(R // TILE, S // cw),
            in_specs=[pl.BlockSpec((TILE, cw), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((TILE, cw), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((R, S), dtype),
            interpret=interpret,
        )(C)


@functools.lru_cache(maxsize=None)
def tri_tile_tables(nt: int):
    """(i_tab, j_tab) int32 coordinate tables of the lower-tile
    triangle enumeration shared by gram_u32_tri / gram_u32_pk_tri /
    tril_tiles."""
    i_tab = np.repeat(np.arange(nt, dtype=np.int32),
                      np.arange(1, nt + 1))
    j_tab = np.concatenate([np.arange(i + 1, dtype=np.int32)
                            for i in range(nt)])
    return i_tab, j_tab


def untile_symmetric(tiles: np.ndarray, S: int) -> np.ndarray:
    """Rebuild the full symmetric uint32[S, S] matrix from tril_tiles
    output (host side)."""
    n_tri, T, _ = tiles.shape
    nt = int((np.sqrt(8 * n_tri + 1) - 1) / 2 + 0.5)
    S_pad = nt * T
    i_tab, j_tab = tri_tile_tables(nt)
    C = np.empty((S_pad, S_pad), dtype=tiles.dtype)
    for t in range(n_tri):
        i, j = int(i_tab[t]), int(j_tab[t])
        C[i * T:(i + 1) * T, j * T:(j + 1) * T] = tiles[t]
        if i != j:
            # diagonal tiles are computed in full by the Gram kernels
            # (already symmetric); only off-diagonal tiles mirror
            C[j * T:(j + 1) * T, i * T:(i + 1) * T] = tiles[t].T
    return np.ascontiguousarray(C[:S, :S])


def _matmul_tile_kernel(h_ref, b_ref, out_ref, *, n_limbs):
    """One (q, s, k) grid step: out[q,s] += sum_l (H_l @ B) << 8l.

    H holds per-(query, pattern) hit counts (uint32, limbed in-kernel);
    B is the 0/1 int8 pattern-sample incidence.  Used by the batched
    new2all path: sims = H @ B (reference one2all pattern-count apply,
    similarity_calculator.cpp:737-794, as an MXU contraction)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    h = h_ref[:].astype(jnp.uint32)   # (TILE, KT); u8 when 1-limb
    b = b_ref[:].astype(jnp.float32).astype(jnp.bfloat16)   # (KT, TILE)
    acc = jnp.zeros(out_ref.shape, jnp.uint32)
    for l in range(n_limbs):
        hl = ((h >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(
            jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            hl, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + (part.astype(jnp.int32).astype(jnp.uint32)
                     << np.uint32(8 * l))
    out_ref[:] += acc


def matmul_u32(H, B, *, n_limbs: int, interpret: bool | None = None):
    """C = H @ B in exact uint32.

    H: uint32[Q, P] (entries < 2^(8*n_limbs)); B: int8 0/1 [P, S].
    Q, S multiples of TILE; P multiple of KT (caller pads; pad pattern
    rows must be all-zero in B or H).  Exactness: per limb each K-block
    partial is < 2^8 * KT < 2^24 (exact f32), recombination in uint32.
    """
    if interpret is None:
        interpret = not on_tpu()
    Q, P = H.shape
    S = B.shape[1]
    grid = (Q // TILE, S // TILE, P // KT)
    kernel = functools.partial(_matmul_tile_kernel, n_limbs=n_limbs)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, KT), lambda q, s, k: (q, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KT, TILE), lambda q, s, k: (k, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda q, s, k: (q, s),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, S), jnp.uint32),
            interpret=interpret,
        )(H, B)


def _matmul_acc_kernel(h_ref, b_ref, c_ref, out_ref, *, n_limbs):
    """(q, s, k) step of the accumulating query contraction:
    out = C_in + sum_k sum_l (H_l @ B) << 8l, C aliased to out."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]

    h = h_ref[:].astype(jnp.uint32)   # (TILE, KT); u8 when 1-limb
    b = b_ref[:].astype(jnp.float32).astype(jnp.bfloat16)   # (KT, TILE)
    acc = jnp.zeros(out_ref.shape, jnp.uint32)
    for l in range(n_limbs):
        hl = ((h >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(
            jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            hl, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + (part.astype(jnp.int32).astype(jnp.uint32)
                     << np.uint32(8 * l))
    out_ref[:] += acc


def matmul_u32_acc(H, B, C, *, n_limbs: int,
                   interpret: bool | None = None):
    """C + H @ B in exact uint32 with C aliased to the output — the
    chunk-accumulating form of matmul_u32 used by the Mosaic-first
    new2all device tier (no XLA dot programs on the hot path; see
    device_a2a module doc for why that matters on tunneled rigs)."""
    if interpret is None:
        interpret = not on_tpu()
    Q, P = H.shape
    S = B.shape[1]
    grid = (Q // TILE, S // TILE, P // KT)
    kernel = functools.partial(_matmul_acc_kernel, n_limbs=n_limbs)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, KT), lambda q, s, k: (q, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KT, TILE), lambda q, s, k: (k, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, TILE), lambda q, s, k: (q, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda q, s, k: (q, s),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, S), jnp.uint32),
            input_output_aliases={2: 0},
            interpret=interpret,
        )(H, B, C)


def _cross_pk_kernel(w_ref, bpi_ref, bpj_ref, c_ref, out_ref, *,
                     n_limbs, engine="bf16"):
    """(i, j, k) step of the packed cross-database contraction
    C = C_in + U^T diag(w) V (full rectangular grid, U != V)."""
    _PK_BODIES[engine](pl.program_id(2), w_ref, bpi_ref, bpj_ref, c_ref,
                       out_ref, n_limbs)


def cross_u32_pk(Up, Vp, w, C, *, n_limbs: int,
                 interpret: bool | None = None,
                 kt: int | None = None, tile: int | None = None,
                 engine: str = "bf16"):
    """C + U^T diag(w) V over pattern-axis bit-packed operands — the
    Mosaic db2db kernel (reference db2db_sp,
    similarity_calculator.cpp:1225-1540): rows of Up/Vp pack eight
    pattern-PAIR incidence rows per byte (same layout and b-major
    weight order as gram_u32_pk_tri); C: uint32[S1, S2] aliased to the
    output.  kt/tile/engine as in gram_u32_pk_tri (S1 and S2 must both
    be multiples of tile)."""
    if interpret is None:
        interpret = not on_tpu()
    kt = kt or KT
    tile = tile or TILE
    Pb, S1 = Up.shape
    S2 = Vp.shape[1]
    P = Pb * 8
    KB = kt // 8
    grid = (S1 // tile, S2 // tile, P // kt)
    kernel = functools.partial(_cross_pk_kernel, n_limbs=n_limbs,
                               engine=engine)
    # 32-bit tracing: see gram_u32 (x64 breaks Mosaic grid plumbing)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((kt, 1), lambda i, j, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, tile), lambda i, j, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, tile), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, tile), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S1, S2), jnp.uint32),
            input_output_aliases={3: 0},
            interpret=interpret,
        )(w, Up, Vp, C)


def matmul_u32_reference(H, B, *, n_limbs: int):
    """Pure-XLA reference of matmul_u32 (same limb decomposition)."""
    H = H.astype(jnp.uint32)    # m2a_prepare emits u8 when 1-limb
    Bf = B.astype(jnp.bfloat16)
    C = jnp.zeros((H.shape[0], B.shape[1]), dtype=jnp.uint32)
    for l in range(n_limbs):
        hl = ((H >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            hl, Bf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        C = C + (part.astype(jnp.uint32) << np.uint32(8 * l))
    return C


def gram_u32_reference(B, w, *, n_limbs: int):
    """Pure-XLA reference of gram_u32 (same limb decomposition)."""
    Bf = B.astype(jnp.bfloat16)
    C = jnp.zeros((B.shape[1], B.shape[1]), dtype=jnp.uint32)
    w = w.reshape(-1)
    for l in range(n_limbs):
        wl = ((w >> np.uint32(8 * l)) & np.uint32(0xFF)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            Bf * wl[:, None], Bf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        C = C + (part.astype(jnp.uint32) << np.uint32(8 * l))
    return C
