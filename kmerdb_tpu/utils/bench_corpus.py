"""Deterministic synthetic benchmark corpus.

The reference's scale corpus (ICTV phage set, test/ictv/ictv.list) is
not committed, so the benchmark uses a reproducible stand-in with
similar structure: clusters of related genomes (shared ancestry +
point mutations) so the pattern decomposition is non-trivial, as in
real pangenome collections.
"""

import os

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def generate(out_dir: str, n_samples: int = 128, genome_len: int = 300_000,
             n_ancestors: int = 4, seed: int = 20260816) -> str:
    """Write one FASTA per sample + a list file; returns list path."""
    os.makedirs(out_dir, exist_ok=True)
    list_path = os.path.join(out_dir, "corpus.list")
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker) and os.path.exists(list_path):
        return list_path

    rng = np.random.default_rng(seed)
    ancestors = [rng.integers(0, 4, size=genome_len, dtype=np.int8)
                 for _ in range(n_ancestors)]
    paths = []
    for i in range(n_samples):
        anc = ancestors[i % n_ancestors]
        rate = 0.001 + 0.02 * (i / n_samples)
        genome = anc.copy()
        n_mut = int(genome_len * rate)
        pos = rng.integers(0, genome_len, size=n_mut)
        genome[pos] = (genome[pos] + rng.integers(1, 4, size=n_mut)) % 4
        seq = _BASES[genome]
        name = f"s{i:04d}"
        path = os.path.join(out_dir, name + ".fasta")
        with open(path, "wb") as f:
            f.write(b">" + name.encode() + b"\n")
            for j in range(0, genome_len, 80):
                f.write(seq[j:j + 80].tobytes() + b"\n")
        paths.append(os.path.join(out_dir, name))
    with open(list_path, "w") as f:
        f.write("".join(p + "\n" for p in paths))
    with open(marker, "w") as f:
        f.write("ok")
    return list_path
