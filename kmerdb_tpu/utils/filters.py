"""Distance metrics and min/max cell filters.

Metric registry matches reference src/params.cpp:15-41; filters match
src/sparse_filters.h.  Metrics are evaluated in float64 with the same
integer-argument semantics (num_kmers_t is uint32; cnt1+cnt2-common is
computed in uint32 with wraparound, then converted to double).

math.log (glibc libm) is used rather than np.log on the output path:
the reference binary links glibc's log(), and 6-decimal parity can hinge
on the last ulp.  Vectorized variants using np.log exist for on-device /
bulk computation where parity is not required.
"""

import math

import numpy as np

_U32 = np.uint64(0xFFFFFFFF)


def _u32(x):
    return int(x) & 0xFFFFFFFF


def jaccard(common, cnt1, cnt2, k):
    return float(common) / _u32(cnt1 + cnt2 - common)


def metric_min(common, cnt1, cnt2, k):
    return float(common) / min(_u32(cnt1), _u32(cnt2))


def metric_max(common, cnt1, cnt2, k):
    return float(common) / max(_u32(cnt1), _u32(cnt2))


def cosine(common, cnt1, cnt2, k):
    # reference: common / sqrt(cnt1 * cnt2); cnt1*cnt2 in uint32 wraps!
    # (num_kmers_t * num_kmers_t is uint32 arithmetic in C++)
    return float(common) / math.sqrt(_u32(_u32(cnt1) * _u32(cnt2)))


def mash(common, query_cnt, db_cnt, k):
    d_j = float(common) / _u32(query_cnt + db_cnt - common)
    if d_j == 0:
        return 1.0
    return (-1.0 / k) * math.log((2 * d_j) / (d_j + 1))


def ani(common, query_cnt, db_cnt, k):
    return 1.0 - mash(common, query_cnt, db_cnt, k)


def ani_shorter(common, query_cnt, db_cnt, k):
    d_j = float(common) / min(_u32(query_cnt), _u32(db_cnt))
    d_m = 1.0 if d_j == 0 else (-1.0 / k) * math.log((2 * d_j) / (d_j + 1))
    return 1.0 - d_m


def mash_query(common, query_cnt, db_cnt, k):
    d_j = float(common) / _u32(query_cnt)
    if d_j == 0:
        return 1.0
    return (-1.0 / k) * math.log((2 * d_j) / (d_j + 1))


def num_kmers(common, query_cnt, db_cnt, k):
    return float(common)


AVAILABLE_METRICS = {
    "jaccard": jaccard,
    "min": metric_min,
    "max": metric_max,
    "cosine": cosine,
    "mash": mash,
    "ani": ani,
    "ani-shorter": ani_shorter,
    "mash-query": mash_query,
    "num-kmers": num_kmers,
}


class MetricFilter:
    """Bounds on a metric value (sparse_filters.h:12-23)."""

    def __init__(self):
        self.bounds = [-math.inf, math.inf]
        self.metric = None

    def __call__(self, common, cnt1, cnt2, kmer_length):
        v = self.metric(common, cnt1, cnt2, kmer_length)
        return self.bounds[0] <= v <= self.bounds[1]


class KmerFilter:
    """Bounds on the raw common-k-mer count (sparse_filters.h:26-30)."""

    def __init__(self):
        self.bounds = [0, 0xFFFFFFFF]

    def __call__(self, n):
        return self.bounds[0] <= n <= self.bounds[1]

    @property
    def is_trivial(self):
        return self.bounds[0] <= 0 and self.bounds[1] >= 0xFFFFFFFF


class CombinedFilter:
    """AND of all metric filters + the kmer filter (sparse_filters.h:33-61)."""

    def __init__(self, metric_filters, kmer_filter, row_counts, col_counts, kmer_length):
        self.metric_filters = metric_filters
        self.kmer_filter = kmer_filter
        self.row_counts = row_counts
        self.col_counts = col_counts
        self.kmer_length = kmer_length

    def __call__(self, common, row_id, col_id):
        for f in self.metric_filters.values():
            if not f(common, self.row_counts[row_id], self.col_counts[col_id],
                     self.kmer_length):
                return False
        return self.kmer_filter(common)

    def mask_row(self, values: np.ndarray, row_id: int,
                 col_ids: np.ndarray | None = None) -> np.ndarray:
        """Vectorized: boolean keep-mask for a row of counts."""
        values = np.asarray(values)
        if col_ids is None:
            col_ids = np.arange(values.size)
        keep = np.ones(values.size, dtype=bool)
        for i in range(values.size):
            if not self(int(values[i]), row_id, int(col_ids[i])):
                keep[i] = False
        return keep

    @property
    def is_trivial(self):
        return not self.metric_filters and self.kmer_filter.is_trivial
