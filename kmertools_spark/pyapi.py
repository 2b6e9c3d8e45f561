"""Drop-in twin of the reference's `pykmertools` Python API.

A user of pykmertools (pip/src/lib.rs:31-40) can switch imports to
`kmertools_spark.pyapi` and run the same code: same class names,
signatures, defaults, return shapes and error behavior
(pybindings/src/{oligo,cgr,kmer,min}.rs + pykmertools.pyi), implemented
over the numpy oracle kernels — including the binding-only raw-mode
normalization quirk (pybindings/src/oligo.rs:59-63).
"""

from __future__ import annotations

from .oracle.codec import kmer_pos_maps
from .oracle.codec import kmer_to_numeric as _k2n
from .oracle.codec import numeric_to_kmer as _n2k
from .oracle.kernels import (
    cgr_trajectory,
    composition_matrix,
    kmer_minimiser_runs,
    minimiser_runs,
)
from .oracle.reference import kmer_iter_lazy


class OligoComputer:
    """Oligo frequency vectors (pybindings/src/oligo.rs:15-100)."""

    def __init__(self, ksize: int):
        self.ksize = ksize
        self._pos_map, self._pos_kmer, self.kcount = kmer_pos_maps(ksize)

    def vectorise_one(self, seq: str, norm: bool = True, mins: bool = True) -> list[float]:
        mat = composition_matrix(
            [seq],
            self.ksize,
            canonical=mins,
            norm=norm,
            pos_map=self._pos_map if mins else None,
            kcount=self.kcount if mins else None,
            binding_quirk=True,  # this IS the binding (total += 2 in raw mode)
        )
        return mat[0].tolist()

    def vectorise_batch(
        self, seqs: list[str], norm: bool = True, mins: bool = True
    ) -> list[list[float]]:
        mat = composition_matrix(
            seqs,
            self.ksize,
            canonical=mins,
            norm=norm,
            pos_map=self._pos_map if mins else None,
            kcount=self.kcount if mins else None,
            binding_quirk=True,
        )
        return [row.tolist() for row in mat]

    def get_header(self, mins: bool = True) -> list[str]:
        # delegate to the ONE header builder (code-review r4: the slot
        # label contract was maintained in two places)
        from .functions.composition import vector_header

        return vector_header(self.ksize, canonical=mins)


class CgrComputer:
    """Chaos-game-representation vectors (pybindings/src/cgr.rs:16-62)."""

    def __init__(self, vecsize: int):
        self.vecsize = float(vecsize)

    def vectorise_one(self, seq: str) -> list[tuple[float, float]]:
        tr = cgr_trajectory(seq, self.vecsize)
        if tr is None:
            raise ValueError("Bad nucleotide, unable to proceed")
        return [(float(x), float(y)) for x, y in tr]

    def vectorise_batch(self, seqs: list[str]) -> list[list[tuple[float, float]]]:
        return [self.vectorise_one(s) for s in seqs]


class KmerGenerator:
    """Iterator of (fwd, rc) k-mers (pybindings/src/kmer.rs:15-42).

    Lazy and single-pass, like the PyO3 iterator it mirrors: nothing is
    materialized up front (a chromosome-scale sequence streams in O(1)
    memory), and a second ``for`` loop over the same object yields
    nothing (code-review r5 — the old eager list was both an OOM and a
    re-iterability divergence)."""

    def __init__(self, seq: str, ksize: int):
        self._it = kmer_iter_lazy(seq, ksize)
        self._ksize = ksize

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def kmer_pos_maps(self):
        pos_map, pos_kmer, count = kmer_pos_maps(self._ksize)
        return pos_map.tolist(), {int(i): int(v) for i, v in enumerate(pos_kmer)}, count


class MinimiserGenerator:
    """Iterator of (minimiser, start, end) runs (pybindings/src/min.rs:15-48).

    Single-pass like the PyO3 iterator. The runs themselves come from
    the vectorized batch kernel (output is O(#runs), far smaller than
    the input; the per-item laziness that matters at chromosome scale
    is KmerGenerator's, whose output is O(#positions))."""

    def __init__(self, seq: str, wsize: int, msize: int):
        self._it = iter(minimiser_runs(seq, wsize, msize))
        self._msize = msize

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def to_acgt(self, kmer: int) -> str:
        return _n2k(kmer, self._msize)


class KmerMinimiserGenerator:
    """Iterator of (minimiser, start, end, kmers) runs
    (kmer/src/kmer_minimisers.rs:69-205). Single-pass."""

    def __init__(self, seq: str, wsize: int, msize: int):
        self._it = iter(kmer_minimiser_runs(seq, wsize, msize))

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)


def run_cli(args: list[str]) -> int:
    """The whole CLI exposed through the Python module, mirroring
    pykmertools.run_cli (pip/src/lib.rs:11-18)."""
    from .cli import main

    return main(args)


class utils:  # noqa: N801 — module-style namespace, matches pykmertools.utils
    @staticmethod
    def to_acgt(kmer: int, k: int) -> str:
        return _n2k(kmer, k)

    @staticmethod
    def to_numeric(kmer: str) -> tuple[int, int]:
        # the length guard lives in codec.kmer_to_numeric (one site)
        return _k2n(kmer)
