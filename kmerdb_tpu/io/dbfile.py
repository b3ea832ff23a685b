"""Database (de)serialization with partial-load modes.

The DB file is the checkpoint artifact, exactly as in the reference
(SURVEY §5): build writes it, every query mode loads it, -extend loads
then continues.  The on-disk format is ours (CSV parity is judged on
outputs, not DB bytes): an uncompressed .npz container whose members
can be loaded selectively, mirroring the reference's partial
deserialization modes (kmer_db.h:55-60):

* SAMPLES_ONLY   -> metadata + sample table            (SamplesOnly)
* PATTERNS       -> + pattern CSR and weights          (SkipHashtables:
                     enough for all2all/all2all-sp)
* EVERYTHING     -> + sorted k-mer array + pattern ids (Everything /
                     CompactedHashtables: enough for one2all/new2all/
                     db2db and -extend)
"""

import json
import zipfile

import numpy as np

from ..models.database import KmerPatternDb

SAMPLES_ONLY = "samples_only"
PATTERNS = "patterns"
EVERYTHING = "everything"

_MAGIC = "kmerdb_tpu-db-v1"


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
    names = "\n".join(db.sample_names)
    with open(path, "wb") as f:
        np.savez(f,
                 meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
                 sample_names=np.frombuffer(names.encode(), dtype=np.uint8),
                 sample_kmer_counts=db.sample_kmer_counts,
                 pattern_offsets=db.pattern_offsets,
                 pattern_sample_ids=db.pattern_sample_ids,
                 pattern_num_kmers=db.pattern_num_kmers,
                 kmers=db.kmers,
                 kmer_pattern_ids=db.kmer_pattern_ids)


def load_db(path: str, mode: str = EVERYTHING) -> KmerPatternDb:
    try:
        z = np.load(path, allow_pickle=False)
    except (OSError, zipfile.BadZipFile) as e:
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
        if mode in (PATTERNS, EVERYTHING):
            db.pattern_offsets = z["pattern_offsets"]
            db.pattern_sample_ids = z["pattern_sample_ids"]
            db.pattern_num_kmers = z["pattern_num_kmers"]
        if mode == EVERYTHING:
            db.kmers = z["kmers"]
            db.kmer_pattern_ids = z["kmer_pattern_ids"]
    return db
