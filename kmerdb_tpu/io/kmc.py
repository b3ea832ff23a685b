"""KMC database (.kmc_pre/.kmc_suf) reader.

Placeholder: the vendored reference reader lives in src/kmc_api/
(CKMCFile::OpenForListing + ReadNextKmer, kmc_file.cpp).  A native
Python/NumPy decoder of the KMC1/KMC2 prefix/suffix layout is planned;
until then KMC inputs raise a clear error.
"""


def load(path: str, fraction: float, fraction_start: float):
    raise NotImplementedError(
        "KMC input (-from-kmers) is not implemented yet in kmerdb_tpu")
