"""Sample ingest: contig bytes -> sorted, deduplicated packed k-mer arrays.

This replaces the reference's LoaderEx thread pipeline + per-sample
pdqsort (src/loader_ex.{h,cpp}, src/console_build.cpp:94-103) with a
batched device pipeline: contigs are bucketed into padded uint8 blocks
(power-of-two geometry to bound jit specializations), extraction runs
as one fused XLA program per bucket shape, and sort+unique happens on
device.  Ragged genome inputs feeding a fixed-shape device pipeline is
the SURVEY hard-part #4; bucketing is the answer here.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import KMER_SENTINEL
from ..ops.alphabet import Alphabet
from ..ops import extract


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


def extract_sample_kmers(contigs: list[bytes], k: int, alphabet: Alphabet,
                         fraction: float = 1.0, start: float = 0.0,
                         use_device: bool = True) -> np.ndarray:
    """All (filtered, canonical) k-mers of one sample: sorted + unique.

    Matches console_build.cpp:94-103 postprocessing: sort + unique of
    the concatenated per-contig extraction output.
    """
    contigs = [c for c in contigs if len(c) >= k]
    if not contigs:
        return np.empty(0, dtype=np.uint64)

    # bucket contigs by padded length
    buckets: dict[int, list[bytes]] = {}
    for c in contigs:
        buckets.setdefault(max(_ceil_pow2(len(c)), 64), []).append(c)

    pieces = []
    for L, group in sorted(buckets.items()):
        B = len(group)
        Bpad = _ceil_pow2(B)
        block = np.zeros((Bpad, L), dtype=np.uint8)
        lengths = np.zeros(Bpad, dtype=np.int32)
        for i, c in enumerate(group):
            arr = np.frombuffer(c, dtype=np.uint8)
            block[i, :arr.size] = arr
            lengths[i] = arr.size
        if use_device:
            out = np.asarray(extract.extract_block_jnp(
                jnp.asarray(block), jnp.asarray(lengths), k, alphabet,
                fraction, start))
        else:
            out = extract.extract_block_np(block, lengths, k, alphabet,
                                           fraction, start)
        pieces.append(out.ravel())

    flat = np.concatenate(pieces)
    flat.sort(kind="stable")
    n_valid = int(np.searchsorted(flat, KMER_SENTINEL))
    flat = flat[:n_valid]
    if flat.size == 0:
        return flat
    keep = np.empty(flat.size, dtype=bool)
    keep[0] = True
    np.not_equal(flat[1:], flat[:-1], out=keep[1:])
    return np.ascontiguousarray(flat[keep])


def extract_kmers_multiset(contigs: list[bytes], k: int, alphabet: Alphabet,
                           fraction: float = 1.0, start: float = 0.0,
                           use_device: bool = True) -> np.ndarray:
    """Like extract_sample_kmers but without dedup (sorted, with
    duplicates) — the minhash console stores this form
    (console_minhash.cpp:38-45 uses sortAndUnique for GENOME; KMC keeps
    duplicates sorted).  Currently used for parity tooling/tests."""
    contigs = [c for c in contigs if len(c) >= k]
    out = []
    for c in contigs:
        arr = np.frombuffer(c, dtype=np.uint8)[None, :]
        res = extract.extract_block_np(arr, np.array([arr.size], np.int32),
                                       k, alphabet, fraction, start)
        res = res.ravel()
        out.append(res[res != KMER_SENTINEL])
    if not out:
        return np.empty(0, dtype=np.uint64)
    flat = np.concatenate(out)
    flat.sort(kind="stable")
    return flat
