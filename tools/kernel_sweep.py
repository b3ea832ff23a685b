"""Gram-kernel variant sweep on the real TPU chip.

Round-3 perf campaign (VERDICT r2 item 1): the packed triangle Gram
plateaus at ~9 TFLOPS (4.6% of v5e bf16 peak).  This tool measures
isolated kernel variants on synthetic resident data to find what the
plateau is made of:

  bf16       current production body (unpack -> bf16, scale, dot)
  bf16_ns    same without the weight scale (isolate the scale cost)
  int8       unpack -> int8, int8 x int8 -> int32 MXU (2x peak rate,
             no f32 hop; weights must fit 7 bits per limb)
  nodot      unpack only (isolate the unpack throughput)
  dotonly    pre-unpacked bf16 operands, contraction dim 0 (grid+MXU
             ceiling without any unpack; smaller P for memory)
  dotonly_T  pre-unpacked with lhs laid out (tile, kt) and contraction
             ((1,),(0,)) (does Mosaic pay for the dim-0 contraction?)
  dotonly_s8 pre-unpacked int8 operands

Timing: chained aliased calls C = k(C, ...) so device execution
serializes; wall time of N2 vs N1 calls differenced to cancel the
(slow, ~10 MB/s) result pull.  Never trusts block_until_ready through
the tunnel — sync is np.asarray (memory: kmerdb-env-quirks).

Usage: python tools/kernel_sweep.py [variant ...] [--kt 512] [--tile 128]
Results append to /tmp/kernel_sweep.jsonl
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from kmerdb_tpu._jaxinit import jax_modules

jax, jnp = jax_modules()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerdb_tpu.ops import pallas_gram


def tri_grid_spec(nt, n_k, kb, tile, packed, acc_dtype):
    i_tab, j_tab = pallas_gram.tri_tile_tables(nt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt * (nt + 1) // 2, n_k),
        in_specs=[
            pl.BlockSpec((kb * (8 if packed else 1), 1),
                         lambda t, k, it, jt: (k, 0)),
            pl.BlockSpec((kb, tile), lambda t, k, it, jt: (k, it[t])),
            pl.BlockSpec((kb, tile), lambda t, k, it, jt: (k, jt[t])),
            pl.BlockSpec((tile, tile),
                         lambda t, k, it, jt: (it[t], jt[t])),
        ],
        out_specs=pl.BlockSpec((tile, tile),
                               lambda t, k, it, jt: (it[t], jt[t])),
    )
    return grid_spec, i_tab, j_tab


def unpack_bits(bp, out_dtype):
    b32 = bp.astype(jnp.int32)
    rows = [((b32 >> b) & 1) for b in range(8)]
    return jnp.concatenate(rows, axis=0).astype(out_dtype)


def body_bf16(k, w_ref, bi_ref, bj_ref, c_ref, out_ref, *, scale=True):
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]
    bi = unpack_bits(bi_ref[:], jnp.float32).astype(jnp.bfloat16)
    bj = unpack_bits(bj_ref[:], jnp.float32).astype(jnp.bfloat16)
    if scale:
        wl = (w_ref[:] & np.uint32(0xFF)).astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)
        bi = bi * wl
    part = jax.lax.dot_general(
        bi, bj, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] += part.astype(jnp.int32).astype(jnp.uint32)


def body_int8(k, w_ref, bi_ref, bj_ref, c_ref, out_ref):
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]
    wl = (w_ref[:] & np.uint32(0x7F)).astype(jnp.int32)
    b32i = bi_ref[:].astype(jnp.int32)
    KB = b32i.shape[0]
    rows = [((b32i >> b) & 1) * wl[b * KB:(b + 1) * KB] for b in range(8)]
    bi = jnp.concatenate(rows, axis=0).astype(jnp.int8)
    bj = unpack_bits(bj_ref[:], jnp.int8)
    part = jax.lax.dot_general(
        bi, bj, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] += part.astype(jnp.uint32)


def body_nodot(k, w_ref, bi_ref, bj_ref, c_ref, out_ref):
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]
    bi = unpack_bits(bi_ref[:], jnp.float32).astype(jnp.bfloat16)
    bj = unpack_bits(bj_ref[:], jnp.float32).astype(jnp.bfloat16)
    tile = out_ref.shape[0]
    # touch both operands without an MXU op
    out_ref[:] += (bi[:tile] + bj[:tile]).astype(jnp.int32).astype(
        jnp.uint32)


def body_dotonly(k, w_ref, bi_ref, bj_ref, c_ref, out_ref, *,
                 transposed_lhs=False, s8=False):
    @pl.when(k == 0)
    def _():
        out_ref[:] = c_ref[:]
    pet = jnp.int32 if s8 else jnp.float32
    if transposed_lhs:
        dims = (((1,), (0,)), ((), ()))
    else:
        dims = (((0,), (0,)), ((), ()))
    part = jax.lax.dot_general(bi_ref[:], bj_ref[:],
                               dimension_numbers=dims,
                               preferred_element_type=pet)
    out_ref[:] += part.astype(jnp.int32).astype(jnp.uint32)


def build(variant, S, P, kt, tile):
    nt = S // tile
    n_k = P // kt
    packed = variant in ("bf16", "bf16_ns", "int8", "nodot")
    kb = kt // 8 if packed else kt
    if variant == "bf16":
        kern = functools.partial(body_bf16, scale=True)
    elif variant == "bf16_ns":
        kern = functools.partial(body_bf16, scale=False)
    elif variant == "int8":
        kern = body_int8
    elif variant == "nodot":
        kern = body_nodot
    elif variant == "dotonly":
        kern = functools.partial(body_dotonly)
    elif variant == "dotonly_T":
        kern = functools.partial(body_dotonly, transposed_lhs=True)
    elif variant == "dotonly_s8":
        kern = functools.partial(body_dotonly, s8=True)
    else:
        raise SystemExit(f"unknown variant {variant}")

    grid_spec, i_tab, j_tab = tri_grid_spec(nt, n_k, kb, tile, packed,
                                            jnp.uint32)
    if variant == "dotonly_T":
        # lhs blocks are (tile, kt) slices of a transposed operand
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt * (nt + 1) // 2, n_k),
            in_specs=[
                pl.BlockSpec((kt, 1), lambda t, k, it, jt: (k, 0)),
                pl.BlockSpec((tile, kt), lambda t, k, it, jt: (it[t], k)),
                pl.BlockSpec((kt, tile), lambda t, k, it, jt: (k, jt[t])),
                pl.BlockSpec((tile, tile),
                             lambda t, k, it, jt: (it[t], jt[t])),
            ],
            out_specs=pl.BlockSpec((tile, tile),
                                   lambda t, k, it, jt: (it[t], jt[t])),
        )

    def wrap(t_kern):
        def step(w, Bi, Bj, C):
            def kbody(it_ref, jt_ref, w_ref, bi_ref, bj_ref, c_ref,
                      out_ref):
                t_kern(pl.program_id(1), w_ref, bi_ref, bj_ref, c_ref,
                       out_ref)
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kbody,
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((S, S), jnp.uint32),
                    input_output_aliases={5: 0},
                )(jnp.asarray(i_tab), jnp.asarray(j_tab), w, Bi, Bj, C)
        return step

    return wrap(kern), packed


def run_variant(variant, S, P, kt, tile, n1=4, n2=20):
    rng = np.random.default_rng(0)
    packed_rows = P // 8
    if variant.startswith("dotonly"):
        dt = np.int8 if variant == "dotonly_s8" else np.float32
        Braw = rng.integers(0, 2, size=(P, S), dtype=np.int8)
        Bi_h = Braw.astype(jnp.bfloat16 if dt is np.float32 else np.int8)
        if variant == "dotonly_T":
            Bi_h = np.ascontiguousarray(Braw.T).astype(Bi_h.dtype)
        Bj_h = Braw.astype(Bi_h.dtype)
        del Braw
    else:
        Bi_h = rng.integers(0, 256, size=(packed_rows, S), dtype=np.uint8)
        Bj_h = Bi_h
    w_h = rng.integers(1, 128, size=(P, 1), dtype=np.uint32)

    step, packed = build(variant, S, P, kt, tile)
    ex = jax.jit(step, donate_argnums=(3,)).lower(
        jax.ShapeDtypeStruct(w_h.shape, jnp.uint32),
        jax.ShapeDtypeStruct(Bi_h.shape, jnp.dtype(Bi_h.dtype)),
        jax.ShapeDtypeStruct(Bj_h.shape, jnp.dtype(Bj_h.dtype)),
        jax.ShapeDtypeStruct((S, S), jnp.uint32)).compile()

    w = jax.device_put(w_h)
    Bi = jax.device_put(Bi_h)
    Bj = jax.device_put(Bj_h)

    def timed(n):
        C = jax.device_put(np.zeros((S, S), dtype=np.uint32))
        t0 = time.perf_counter()
        for _ in range(n):
            C = ex(w, Bi, Bj, C)
        np.asarray(C)
        return time.perf_counter() - t0

    timed(1)          # service warm-up pass (can stall minutes, once)
    t1 = timed(n1)
    t2 = timed(n2)
    per_call = (t2 - t1) / (n2 - n1)
    nt = S // tile
    n_tri = nt * (nt + 1) // 2
    flops = 2.0 * n_tri * tile * tile * P
    res = {"variant": variant, "S": S, "P": P, "kt": kt, "tile": tile,
           "per_call_s": round(per_call, 4),
           "tflops": round(flops / per_call / 1e12, 2),
           "t_n1": round(t1, 3), "t_n2": round(t2, 3)}
    print(json.dumps(res), flush=True)
    with open("/tmp/kernel_sweep.jsonl", "a") as f:
        f.write(json.dumps(res) + "\n")
    return res


def sweep_on_db(db_path, kts, tiles):
    """Geometry sweep of the PRODUCTION kernel on a real database's
    packed incidence (VERDICT r3 item 8: pick_tile's table was derived
    from the synthetic variant sweep only).  Reuses the exact
    kernel_bench protocol — chained aliased triangle-Gram calls on the
    resident incidence, pull cost differenced out — so rows here are
    directly comparable to BENCH's kernel_tflops, but per (kt, tile)."""
    import os

    from kmerdb_tpu.io import dbfile
    from kmerdb_tpu.ops import device_a2a

    db = dbfile.load_db(db_path, dbfile.PATTERNS)
    rows = []
    for kt in kts:
        for tile in tiles:
            os.environ["KMERDB_A2A_KT"] = str(kt)
            os.environ["KMERDB_A2A_TILE"] = str(tile)
            try:
                kb = device_a2a.kernel_bench(db)
                msg = {"on_db": db_path, "S": db.n_samples,
                       "n_patterns": int(db.n_patterns), **kb}
            except Exception as e:
                msg = {"on_db": db_path, "kt": kt, "tile": tile,
                       "error": repr(e)[:300]}
            finally:
                os.environ.pop("KMERDB_A2A_KT", None)
                os.environ.pop("KMERDB_A2A_TILE", None)
            print(json.dumps(msg), flush=True)
            rows.append(msg)
            with open("/tmp/kernel_sweep.jsonl", "a") as f:
                f.write(json.dumps(msg) + "\n")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*")
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--P", type=int, default=1 << 20)
    ap.add_argument("--kt", type=int, default=512)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--on-db", default=None, metavar="DB",
                    help="sweep the production kernel's (kt, tile) "
                         "geometries on a real database's incidence")
    ap.add_argument("--kts", default="512,1024,2048")
    ap.add_argument("--tiles", default="128,256,512")
    args = ap.parse_args()
    if args.on_db:
        sweep_on_db(args.on_db,
                    [int(x) for x in args.kts.split(",")],
                    [int(x) for x in args.tiles.split(",")])
        return
    for v in args.variants:
        P = args.P
        if v.startswith("dotonly"):
            P = min(P, 1 << 17)   # unpacked operands are 8-16x larger
        try:
            run_variant(v, args.S, P, args.kt, args.tile)
        except Exception as e:
            msg = {"variant": v, "kt": args.kt, "tile": args.tile,
                   "error": repr(e)[:300]}
            print(json.dumps(msg), flush=True)
            with open("/tmp/kernel_sweep.jsonl", "a") as f:
                f.write(json.dumps(msg) + "\n")


if __name__ == "__main__":
    main()
