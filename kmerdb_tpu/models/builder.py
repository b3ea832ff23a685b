"""Batch database construction via sort + segment ops.

The reference inserts samples one at a time into per-prefix hashtables
and forks/extends patterns behind atomic counters
(prefix_kmer_db.cpp:244-434).  That fork-or-extend chain is inherently
sequential per sample (SURVEY hard-part #2).  Here the problem is
re-expressed as a *batch* computation that maps to sorts and segment
reductions (device-friendly, and embarrassingly shardable by k-mer
range):

1. form the multiset of (kmer, sample_id) pairs of the incoming batch,
   plus one virtual element (kmer, PATTERN_REF + old_pattern_id) per
   k-mer already in the database;
2. stable-sort by kmer -> each distinct k-mer becomes a contiguous
   group: [optional old-pattern ref] + new sample ids ascending;
3. the group *content* IS the k-mer's new sample-set; deduplicate
   groups by order-invariant 128-bit set hashing -> pattern ids;
4. pattern CSR = representative group expanded (old pattern's sample
   list ++ new sample ids); pattern weight w_p = #groups mapping to p.

The result is semantically identical to the reference's pattern forest
after the same samples are added in the same order: a pattern is the
exact set of samples sharing a k-mer.
"""

import numpy as np

from .database import KmerPatternDb

#: virtual-id offset marking "reference to an existing pattern"
_PATTERN_REF = np.int64(1) << np.int64(33)

_SALT1 = np.uint64(0x9E3779B97F4A7C15)
_SALT2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64-style finalizer for set hashing (not parity-relevant)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + salt
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _ragged_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat source indices of concatenated slices src[starts[i]:+lens[i]]."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    begins = ends - lens
    return (np.arange(total, dtype=np.int64)
            + np.repeat(starts.astype(np.int64) - begins, lens))


def add_samples(db: KmerPatternDb,
                samples: list[tuple[str, np.ndarray]]) -> KmerPatternDb:
    """Add a batch of (name, sorted-unique-kmer-array) samples.

    Returns a new KmerPatternDb; `db` itself is not mutated.  Covers
    both initial build and -extend (console_build.cpp:48-57): extending
    is just adding a batch to a non-empty database.
    """
    s0 = db.n_samples
    names = list(db.sample_names) + [name for name, _ in samples]
    counts = np.concatenate([
        db.sample_kmer_counts,
        np.array([arr.size for _, arr in samples], dtype=np.uint32),
    ])

    # --- 1. element streams --------------------------------------------
    streams_k = [db.kmers]
    streams_v = [_PATTERN_REF + db.kmer_pattern_ids.astype(np.int64)]
    for i, (_, arr) in enumerate(samples):
        streams_k.append(arr)
        streams_v.append(np.full(arr.size, s0 + i, dtype=np.int64))
    all_k = np.concatenate(streams_k)
    all_v = np.concatenate(streams_v)

    if all_k.size == 0:
        out = KmerPatternDb(
            kmer_length=db.kmer_length, fraction=db.fraction,
            start_fraction=db.start_fraction, alphabet_name=db.alphabet_name,
            sample_names=names, sample_kmer_counts=counts)
        return out

    # --- 2. stable sort by kmer ----------------------------------------
    # stable keeps concat order inside a kmer group: old-pattern ref
    # first, then new sample ids ascending.
    order = np.argsort(all_k, kind="stable")
    sk = all_k[order]
    sv = all_v[order]

    new_group = np.empty(sk.size, dtype=bool)
    new_group[0] = True
    np.not_equal(sk[1:], sk[:-1], out=new_group[1:])
    starts = np.flatnonzero(new_group)
    glens = np.diff(np.append(starts, sk.size))
    unique_kmers = sk[starts]

    # --- 3. order-invariant set hash per group -> pattern dedup --------
    m1 = _mix64(sv.view(np.uint64), _SALT1)
    m2 = _mix64(sv.view(np.uint64), _SALT2)
    h1 = np.bitwise_xor.reduceat(m1, starts)
    with np.errstate(over="ignore"):
        h2 = np.add.reduceat(m2, starts)
    keys = np.empty(starts.size, dtype=[("l", "u8"), ("a", "u8"), ("b", "u8")])
    keys["l"] = glens.astype(np.uint64)
    keys["a"] = h1
    keys["b"] = h2

    _, first_group, inverse = np.unique(keys, return_index=True,
                                        return_inverse=True)
    n_patterns = first_group.size
    kmer_pattern_ids = inverse.astype(np.int32)
    pattern_num_kmers = np.bincount(inverse, minlength=n_patterns
                                    ).astype(np.uint32)

    # --- 4. pattern CSR from representative groups ---------------------
    rep_start = starts[first_group]
    rep_len = glens[first_group]
    has_old = sv[rep_start] >= _PATTERN_REF
    old_pid = np.where(has_old, sv[rep_start] - _PATTERN_REF, 0).astype(np.int64)
    old_off = db.pattern_offsets
    if old_off.size < 2:  # empty db: keep old_off[old_pid + 1] indexable
        old_off = np.zeros(2, dtype=np.int64)
    old_len = np.where(has_old, old_off[old_pid + 1] - old_off[old_pid], 0)
    new_len = rep_len - has_old
    out_len = old_len + new_len

    pattern_offsets = np.zeros(n_patterns + 1, dtype=np.int64)
    np.cumsum(out_len, out=pattern_offsets[1:])
    flat = np.empty(pattern_offsets[-1], dtype=np.uint32)

    # old parts: copy old pattern sample lists to out[begin : begin+old_len]
    src_old = _ragged_indices(old_off[old_pid], old_len)
    dst_old = _ragged_indices(pattern_offsets[:-1], old_len)
    flat[dst_old] = db.pattern_sample_ids[src_old]
    # new parts: group slice minus the optional leading ref element
    src_new = _ragged_indices(rep_start + has_old, new_len)
    dst_new = _ragged_indices(pattern_offsets[:-1] + old_len, new_len)
    flat[dst_new] = sv[src_new].astype(np.uint32)

    return KmerPatternDb(
        kmer_length=db.kmer_length, fraction=db.fraction,
        start_fraction=db.start_fraction, alphabet_name=db.alphabet_name,
        sample_names=names, sample_kmer_counts=counts,
        kmers=unique_kmers, kmer_pattern_ids=kmer_pattern_ids,
        pattern_offsets=pattern_offsets, pattern_sample_ids=flat,
        pattern_num_kmers=pattern_num_kmers)
