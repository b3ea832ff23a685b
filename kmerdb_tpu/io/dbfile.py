"""Database (de)serialization with partial-load modes.

The DB file is the checkpoint artifact, exactly as in the reference
(SURVEY §5): build writes it, every query mode loads it, -extend loads
then continues.  The on-disk format is ours (CSV parity is judged on
outputs, not DB bytes): a flat binary container — a JSON header with a
section table, followed by raw little-endian array bytes — whose
sections can be loaded selectively, mirroring the reference's partial
deserialization modes (kmer_db.h:55-60):

* SAMPLES_ONLY   -> metadata + sample table            (SamplesOnly)
* PATTERNS       -> + pattern CSR and weights          (SkipHashtables:
                     enough for all2all/all2all-sp)
* EVERYTHING     -> + sorted k-mer array + pattern ids (Everything /
                     CompactedHashtables: enough for one2all/new2all/
                     db2db and -extend)

(The previous container was .npz; zipfile CRC32 over the raw arrays
cost more than the rest of serialization combined.  Old .npz databases
are still read transparently.)
"""

import json
import zipfile

import numpy as np

from ..models.database import KmerPatternDb

SAMPLES_ONLY = "samples_only"
PATTERNS = "patterns"
EVERYTHING = "everything"

_MAGIC = "kmerdb_tpu-db-v1"
_FLAT_MAGIC = b"KMDBTPU2"

#: sections needed per load mode
_MODE_SECTIONS = {
    SAMPLES_ONLY: (),
    PATTERNS: ("pattern_offsets", "pattern_sample_ids",
               "pattern_num_kmers"),
    EVERYTHING: ("pattern_offsets", "pattern_sample_ids",
                 "pattern_num_kmers", "kmers", "kmer_pattern_ids"),
}


def save_db(db: KmerPatternDb, path: str) -> None:
    meta = {
        "magic": _MAGIC,
        "kmer_length": int(db.kmer_length),
        "fraction": float(db.fraction),
        "start_fraction": float(db.start_fraction),
        "alphabet": db.alphabet_name,
        "n_samples": db.n_samples,
        "n_kmers": db.n_kmers,
        "n_patterns": db.n_patterns,
    }
    names = "\n".join(db.sample_names).encode()
    arrays = {
        "sample_names": np.frombuffer(names, dtype=np.uint8),
        "sample_kmer_counts": np.ascontiguousarray(db.sample_kmer_counts),
        "pattern_offsets": np.ascontiguousarray(db.pattern_offsets),
        "pattern_sample_ids": np.ascontiguousarray(db.pattern_sample_ids),
        "pattern_num_kmers": np.ascontiguousarray(db.pattern_num_kmers),
        "kmers": np.ascontiguousarray(db.kmers),
        "kmer_pattern_ids": np.ascontiguousarray(db.kmer_pattern_ids),
    }
    sections = {}
    offset = 0
    for name, arr in arrays.items():
        offset = (offset + 63) & ~63
        sections[name] = {"dtype": arr.dtype.str, "n": int(arr.size),
                          "offset": offset}
        offset += arr.nbytes
    header = json.dumps({"meta": meta, "sections": sections}).encode()
    base = len(_FLAT_MAGIC) + 8 + len(header)
    with open(path, "wb") as f:
        f.write(_FLAT_MAGIC)
        f.write(np.uint64(len(header)).tobytes())
        f.write(header)
        for name, arr in arrays.items():
            pos = base + sections[name]["offset"]
            f.seek(pos)
            arr.tofile(f)


def _load_flat(f, path: str, mode: str) -> KmerPatternDb:
    hlen = int(np.frombuffer(f.read(8), dtype=np.uint64)[0])
    hdr = json.loads(f.read(hlen).decode())
    meta = hdr["meta"]
    if meta.get("magic") != _MAGIC:
        raise IOError(f"Not a kmerdb_tpu database: {path}")
    sections = hdr["sections"]
    base = len(_FLAT_MAGIC) + 8 + hlen

    def read(name):
        s = sections[name]
        f.seek(base + s["offset"])
        # read into a bulk-provisioned buffer: np.fromfile's fresh
        # malloc pages fault one-by-one on sandboxed hosts
        from ..utils.native import alloc_array
        arr = alloc_array(s["n"], np.dtype(s["dtype"]))
        got = f.readinto(memoryview(arr.view(np.uint8))) if arr.size else 0
        if got != arr.nbytes:
            raise IOError(f"Truncated k-mer database {path}: section "
                          f"{name} has {got}/{arr.nbytes} bytes")
        return arr

    names_blob = read("sample_names").tobytes().decode()
    db = KmerPatternDb(
        kmer_length=meta["kmer_length"],
        fraction=meta["fraction"],
        start_fraction=meta["start_fraction"],
        alphabet_name=meta["alphabet"],
        sample_names=names_blob.split("\n") if names_blob else [],
        sample_kmer_counts=read("sample_kmer_counts"),
    )
    for name in _MODE_SECTIONS[mode]:
        setattr(db, name, read(name))
    return db


def _load_npz(path: str, mode: str) -> KmerPatternDb:
    try:
        z = np.load(path, allow_pickle=False)
    except (OSError, ValueError, zipfile.BadZipFile) as e:
        raise IOError(f"Cannot open k-mer database {path}") from e
    with z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("magic") != _MAGIC:
            raise IOError(f"Not a kmerdb_tpu database: {path}")
        names_blob = bytes(z["sample_names"]).decode()
        db = KmerPatternDb(
            kmer_length=meta["kmer_length"],
            fraction=meta["fraction"],
            start_fraction=meta["start_fraction"],
            alphabet_name=meta["alphabet"],
            sample_names=names_blob.split("\n") if names_blob else [],
            sample_kmer_counts=z["sample_kmer_counts"],
        )
        for name in _MODE_SECTIONS[mode]:
            setattr(db, name, z[name])
    return db


def load_db(path: str, mode: str = EVERYTHING) -> KmerPatternDb:
    try:
        f = open(path, "rb")
    except OSError as e:
        raise IOError(f"Cannot open k-mer database {path}") from e
    with f:
        magic = f.read(len(_FLAT_MAGIC))
        if magic == _FLAT_MAGIC:
            return _load_flat(f, path, mode)
    # legacy .npz container
    return _load_npz(path, mode)
