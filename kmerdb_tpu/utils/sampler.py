"""Per-row reservoir sampling for -sample-rows (reference src/sampler.h).

Two strategies:
* "best": bounded heap keeping the highest-scoring items; ties broken
  by smaller item id (sampler.h:45-65).  Deterministic.
* "random": uniform reservoir replacement driven by one std::mt19937_64
  per row, default-seeded (sampler.h:67-78).  Reproduced here with a
  bit-exact MT19937-64 so outputs match the reference.
"""

import heapq


class MT19937_64:
    """std::mt19937_64 (default seed 5489), bit-exact."""

    N, M = 312, 156
    MATRIX_A = 0xB5026F5AA96619E9
    UPPER = 0xFFFFFFFF80000000
    LOWER = 0x7FFFFFFF
    MASK = (1 << 64) - 1

    def __init__(self, seed: int = 5489):
        mt = [0] * self.N
        mt[0] = seed & self.MASK
        for i in range(1, self.N):
            mt[i] = (6364136223846793005 * (mt[i - 1] ^ (mt[i - 1] >> 62)) + i) \
                & self.MASK
        self.mt = mt
        self.mti = self.N

    def __call__(self) -> int:
        if self.mti >= self.N:
            mt = self.mt
            for i in range(self.N):
                x = (mt[i] & self.UPPER) | (mt[(i + 1) % self.N] & self.LOWER)
                xa = x >> 1
                if x & 1:
                    xa ^= self.MATRIX_A
                mt[i] = mt[(i + self.M) % self.N] ^ xa
            self.mti = 0
        x = self.mt[self.mti]
        self.mti += 1
        x ^= (x >> 29) & 0x5555555555555555
        x ^= (x << 17) & 0x71D67FFFEDA60000
        x ^= (x << 37) & 0xFFF7EEE000000000
        x ^= x >> 43
        return x


class Sampler:
    def __init__(self, n_rows: int, max_items: int, strategy: str):
        self.max_items = max_items
        self.strategy = strategy
        self.rows: list[list] = [[] for _ in range(n_rows)]
        if strategy == "random":
            self.sizes = [0] * n_rows
            self.mts = [MT19937_64() for _ in range(n_rows)]

    def add(self, row: int, item: int, value: int, score: float):
        data = self.rows[row]
        data.append((item, value, score))
        if self.strategy == "random":
            self.sizes[row] += 1
        if len(data) <= self.max_items:
            return
        if self.strategy == "best":
            self._select_best(data)
        else:
            self._select_random(row, data)

    # heap ordering: "max-heap" whose front is the WORST item —
    # lowest score, ties by larger item id (sampler.h heap_comparer)
    @staticmethod
    def _hkey(entry):
        item, value, score = entry
        return (score, -item)

    def _select_best(self, data):
        # reference keeps a heap once full; emulate: find worst among
        # the first max_items, compare with the newcomer
        new = data.pop()
        worst_i = min(range(len(data)), key=lambda i: self._hkey(data[i]))
        if self._hkey(new) >= self._hkey(data[worst_i]):
            data[worst_i] = new

    def _select_random(self, row, data):
        mt = self.mts[row]
        if mt() % self.sizes[row] == 0:
            pass  # drop the newcomer
        else:
            idx = mt() % self.max_items
            data[idx] = data[-1]
        data.pop()

    def row_pairs(self, row: int):
        """(item+1, value) sorted by item (saveRowSparse, sampler.h:123-138).
        Accepts an optional idx shift having been applied at add() time."""
        return [(item + 1, value)
                for item, value, _ in sorted(self.rows[row],
                                             key=lambda e: e[0])]

    def row_pairs_shifted(self, row: int, idx_shift: int):
        return [(idx_shift + item + 1, value)
                for item, value, _ in sorted(self.rows[row],
                                             key=lambda e: e[0])]

    def n_in_row(self, row: int) -> int:
        return len(self.rows[row])
