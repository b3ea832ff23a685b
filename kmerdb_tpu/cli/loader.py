"""Sample loading orchestration (the reference's LoaderEx role).

Turns the CLI "samples" argument into an ordered stream of
(sample_name, sorted-unique k-mer array) pairs, honoring the three
input formats and multisample-fasta handling
(src/loader_ex.cpp, src/input_file_factory.h).
"""

import sys

import numpy as np

from ..ops.alphabet import get_alphabet
from ..io import fasta, ingest, minhash_file
from . import params as P


class LoadedSample:
    __slots__ = ("name", "kmers", "kmer_length", "fraction", "path")

    def __init__(self, name, kmers, kmer_length, fraction, path=""):
        self.name = name
        self.kmers = kmers
        self.kmer_length = kmer_length
        self.fraction = fraction
        self.path = path


def iter_samples(samples_arg: str, input_format: str, kmer_length: int,
                 fraction: float, fraction_start: float, alphabet_name: str,
                 multisample: bool, dedup: bool = True):
    """Yield LoadedSample in deterministic input order.

    dedup=False keeps sorted duplicates (minhash console's KMC path).
    """
    alphabet = get_alphabet(alphabet_name)

    if input_format == P.GENOME and fasta.is_fasta_path(samples_arg):
        paths = [samples_arg]
    else:
        paths = fasta.read_file_list(samples_arg)

    for path in paths:
        if input_format == P.GENOME:
            real = fasta.resolve_input_path(path)
            if real is None:
                print(f"failed:{path}", file=sys.stderr)
                continue
            headers, seqs = fasta.split_contigs(fasta.read_raw(real))
            if multisample:
                for h, s in zip(headers, seqs):
                    kmers = ingest.extract_sample_kmers(
                        [s], kmer_length, alphabet, fraction, fraction_start)
                    yield LoadedSample(h.decode(), kmers, kmer_length,
                                       fraction, path)
            else:
                kmers = ingest.extract_sample_kmers(
                    seqs, kmer_length, alphabet, fraction, fraction_start)
                yield LoadedSample(fasta.sample_name_from_path(path), kmers,
                                   kmer_length, fraction, path)
        elif input_format == P.MINHASH:
            res = minhash_file.load(path)
            if res is None:
                print(f"failed:{path}", file=sys.stderr)
                continue
            kmers, k, frac = res
            yield LoadedSample(fasta.sample_name_from_path(path), kmers,
                               k, frac, path)
        elif input_format == P.KMC:
            from ..io import kmc
            res = kmc.load(path, fraction, fraction_start)
            if res is None:
                print(f"failed:{path}", file=sys.stderr)
                continue
            kmers, k = res
            kmers = np.sort(kmers, kind="stable")
            yield LoadedSample(fasta.sample_name_from_path(path), kmers,
                               k, fraction, path)
        else:
            raise ValueError(f"unsupported input format {input_format}")
