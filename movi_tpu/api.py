"""High-level API facade.

    import movi_tpu

    index = movi_tpu.build_index("ref.fasta")          # or Index.load(dir)
    index.save("idx_dir")

    res = index.query_pml(reads)                        # [(name, pmls)]
    res = index.query_count(reads)
    res = index.query_zml(reads)
    res = index.query_mems(reads, min_mem_length=20)
    res = index.query_kmers(reads, k=31)
    res = index.query_kmers(reads, k=31, counts=True)   # exact counts
    found = index.classify(reads)                       # SPUMONI binary
    res = index.multi_classify(reads, color_table)      # Movi Color

Reads are (name, bytes) pairs or a fasta/fastq path.  JAX engines are
selected automatically (fused single-gather engines when the index was
built with bound_ff=1, which is the default).
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from .build.prepare_ref import prepare_ref
from .build.suffix import build_bwt_runs
from .index.structure import MoveIndex, build_move_index
from .io.fastx import iter_fastx, make_batches

Reads = Union[str, Sequence[Tuple[str, bytes]]]


def _as_reads(reads: Reads) -> List[Tuple[str, bytes]]:
    if isinstance(reads, (str, os.PathLike)):
        return list(iter_fastx(str(reads)))
    return list(reads)


def _as_batches(reads: Reads, lanes: int):
    """Device-path batching: files go through the native C++ reader +
    packer (io/fastx.batches_from_file) with no per-read Python objects."""
    if isinstance(reads, (str, os.PathLike)):
        from .io.fastx import batches_from_file

        yield from batches_from_file(str(reads), lanes=lanes)
    else:
        yield from make_batches(list(reads), lanes=lanes)


class Index:
    def __init__(self, ix: MoveIndex, bwt_runs=None):
        self.ix = ix
        self._runs = bwt_runs
        self._scalar = None
        self._fused_pml = None
        self._paired_pml = None
        self._fused_search = None
        self._paired_search = None
        self._fused_mem = None
        self._fused_mem2 = None
        self._kmer_si = None
        self._bounded = None

    # ------------------------------------------------------------- build
    @classmethod
    def build(cls, fasta: Union[str, Sequence[str]],
              mode: str = "regular-thresholds", rc: bool = True,
              separators: bool = False, bound_ff: Optional[int] = 1,
              ) -> "Index":
        ref = prepare_ref(fasta, rc=rc, separators=separators)
        runs = build_bwt_runs(ref.text)
        ix = build_move_index(runs, mode, separators=separators,
                              bound_ff=bound_ff)
        return cls(ix, bwt_runs=runs)

    def save(self, index_dir: str, engine_caches: bool = True):
        """Persist index.npz plus the precomputed engine record caches
        (the analogue of the reference shipping its packed rlbwt inside
        index.movi): a later Index.load skips the O(r*sigma) fused
        rebuild and any paired recompose."""
        os.makedirs(index_dir, exist_ok=True)
        self.ix.save(os.path.join(index_dir, "index.npz"))
        if not engine_caches:
            return
        if (self._fused_pml is None and self.ix.thr is not None
                and self._is_bounded()):
            self._ensure_fused()  # materialize the records once
        if self._fused_pml is not None:
            from .engine.fused import save_fused_index

            save_fused_index(self._fused_pml.fi,
                             os.path.join(index_dir, "fused_records.npz"))
        if self._paired_pml is not None:
            from .engine.fused2 import save_fused2_index

            save_fused2_index(self._paired_pml.fi,
                              os.path.join(index_dir,
                                           "paired_records.npz"))
        if self._paired_search is not None:
            from .engine.fused_search2 import save_fused_search2_index

            save_fused_search2_index(
                self._paired_search[0].s2,
                os.path.join(index_dir, "paired_search_records.npz"))

    @classmethod
    def load(cls, index_dir: str) -> "Index":
        self = cls(MoveIndex.load(os.path.join(index_dir, "index.npz")))
        fused = os.path.join(index_dir, "fused_records.npz")
        if os.path.exists(fused):
            try:
                from .engine.fused import FusedPMLEngine, load_fused_index

                self._fused_pml = FusedPMLEngine(load_fused_index(fused))
            except ValueError:
                pass  # stale cache format: rebuild lazily
        paired = os.path.join(index_dir, "paired_records.npz")
        if os.path.exists(paired):
            try:
                from .engine.fused2 import (Fused2PMLEngine,
                                            load_fused2_index)

                self._paired_pml = Fused2PMLEngine(
                    load_fused2_index(paired))
            except ValueError:
                pass
        ps = os.path.join(index_dir, "paired_search_records.npz")
        if os.path.exists(ps):
            try:
                from .engine.fused_search2 import (
                    Fused2CountEngine, Fused2ZMLEngine,
                    load_fused_search2_index)

                s2 = load_fused_search2_index(ps)
                self._paired_search = (Fused2CountEngine(s2),
                                       Fused2ZMLEngine(s2))
            except ValueError:
                pass
        return self

    # --------------------------------------------------------- engines
    @property
    def scalar(self):
        if self._scalar is None:
            from .cpu_ref.advanced import AdvancedEngine

            self._scalar = AdvancedEngine(self.ix)
        return self._scalar

    def _is_bounded(self) -> bool:
        if self._bounded is None:
            ix = self.ix
            lf_abs = ix.all_p[ix.id_arr] + ix.offset_arr
            e = lf_abs + ix.n_arr - 1
            id_end = np.searchsorted(ix.all_p[:-1], e, side="right") - 1
            self._bounded = int((id_end - ix.id_arr).max()) <= 1
        return self._bounded

    # --------------------------------------------------------- queries
    def _ensure_fused(self):
        if self._fused_pml is None:
            from .engine.fused import FusedPMLEngine, build_fused_index

            self._fused_pml = FusedPMLEngine(build_fused_index(self.ix))
        return self._fused_pml

    def query_pml(self, reads: Reads, lanes: int = 8192, jax: bool = True,
                  paired: Optional[bool] = None):
        """paired: True forces the paired two-base records, False the
        one-step layout; None auto-selects by capacity (engine/select)."""
        if jax and self.ix.thr is not None and self._is_bounded():
            from .engine.select import use_paired_pml

            if use_paired_pml(self.ix.r, self.ix.sigma, force=paired):
                if self._paired_pml is None:
                    from .engine.fused2 import (Fused2PMLEngine,
                                                build_fused2_index)

                    self._paired_pml = Fused2PMLEngine(
                        build_fused2_index(self._ensure_fused().fi))
                eng = self._paired_pml
            else:
                eng = self._ensure_fused()
            out = []
            for batch in _as_batches(reads, lanes):
                out.extend(zip(batch.names, eng.query_batch(batch)))
            return out
        reads = _as_reads(reads)
        rand = self.ix.thr is None
        return [(n, self.scalar.query_pml(s, random_repositioning=rand))
                for n, s in reads]

    def _search_engines(self, paired: Optional[bool] = None):
        from .engine.select import use_paired_search

        if use_paired_search(self.ix.r, self.ix.sigma, force=paired):
            if self._paired_search is None:
                from .engine.fused_search2 import (
                    Fused2CountEngine, Fused2ZMLEngine,
                    build_fused_search2_index)

                s2 = build_fused_search2_index(self.ix)
                self._paired_search = (Fused2CountEngine(s2),
                                       Fused2ZMLEngine(s2))
            return self._paired_search
        if self._fused_search is None:
            from .engine.fused_search import (FusedCountEngine,
                                              FusedZMLEngine,
                                              build_fused_search_index)

            si = build_fused_search_index(self.ix)
            self._fused_search = (FusedCountEngine(si), FusedZMLEngine(si))
        return self._fused_search

    def query_count(self, reads: Reads, lanes: int = 8192, jax: bool = True,
                    paired: Optional[bool] = None):
        if jax and self._is_bounded():
            ce, _ = self._search_engines(paired)
            out = []
            for batch in _as_batches(reads, lanes):
                out.extend(zip(batch.names, ce.query_batch(batch)))
            return out
        reads = _as_reads(reads)
        return [(n, self.scalar.query_count(s)) for n, s in reads]

    def query_zml(self, reads: Reads, lanes: int = 8192, jax: bool = True,
                  paired: Optional[bool] = None):
        if jax and self._is_bounded():
            _, ze = self._search_engines(paired)
            out = []
            for batch in _as_batches(reads, lanes):
                out.extend(zip(batch.names, ze.query_batch(batch)))
            return out
        reads = _as_reads(reads)
        return [(n, self.scalar.query_zml(s)) for n, s in reads]

    def query_mems(self, reads: Reads, min_mem_length: int = 0,
                   ftab_k: int = 0, lanes: int = 8192, jax: bool = True):
        reads = _as_reads(reads)
        if (jax and ftab_k <= 1 and self._is_bounded()
                and bytes(self.ix.alphabet) == b"ACGT"):
            from .engine.fused_mem2 import mem2_supported

            if not mem2_supported(self.ix):
                # large-n fallback: the v1 machines cap/skip pos2rba
                from .engine.fused_mem import (FusedAllMemEngine,
                                               FusedMemEngine,
                                               build_fused_mem_index)

                if self._fused_mem is None:
                    self._fused_mem = build_fused_mem_index(self.ix)
                eng = (FusedMemEngine(self._fused_mem, min_mem_length)
                       if min_mem_length >= 2
                       else FusedAllMemEngine(self._fused_mem))
            elif min_mem_length >= 2:
                # BML runs on the v2 one-gather-per-tick records, with
                # ftab-10 anchors (engine-gated to ftab_k <= L)
                from .engine.fused_mem2 import (FusedMem2Engine,
                                                build_fused_mem2_index)

                if self._fused_mem2 is None:
                    self._fused_mem2 = build_fused_mem2_index(
                        self.ix, ftab_k=10)
                eng = FusedMem2Engine(self._fused_mem2, min_mem_length)
            else:
                from .engine.fused_mem2 import (FusedAllMem2Engine,
                                                build_fused_mem2_index)

                if self._fused_mem2 is None:
                    self._fused_mem2 = build_fused_mem2_index(
                        self.ix, ftab_k=10)
                eng = FusedAllMem2Engine(self._fused_mem2)
            out = []
            for batch in make_batches(reads, lanes=lanes):
                out.extend(zip(batch.names, eng.query_batch(batch)))
            return out
        eng = self.scalar
        if ftab_k > 1 and eng.ftab_k != ftab_k:
            eng.build_ftab(ftab_k)
        return [(n, eng.query_mems(s, min_mem_length)) for n, s in reads]

    def query_kmers(self, reads: Reads, k: int = 31, counts: bool = False,
                    lanes: int = 8192, jax: bool = True,
                    paired: Optional[bool] = None):
        reads = _as_reads(reads)
        if jax and counts and self._is_bounded():
            from .engine.select import use_paired_search

            ix = self.ix
            from .engine.fused_mem2 import looks_rc_closed

            if (looks_rc_closed(ix)
                    and use_paired_search(ix.r, ix.sigma, force=paired)):
                # bidirectional k/2-cache engine (rc-complete index
                # detected via count symmetry)
                from .engine.fused_kmer2 import FusedKmer2CountEngine
                from .engine.fused_mem2 import build_fused_mem2_index
                from .engine.fused_search2 import (
                    Fused2CountEngine, Fused2ZMLEngine,
                    build_fused_search2_index)

                if self._fused_mem2 is None:
                    self._fused_mem2 = build_fused_mem2_index(
                        ix, ftab_k=10)
                if self._paired_search is None:
                    s2 = build_fused_search2_index(ix)
                    self._paired_search = (Fused2CountEngine(s2),
                                           Fused2ZMLEngine(s2))
                eng = FusedKmer2CountEngine(
                    self._fused_mem2, self._paired_search[0].s2, k)
                out = []
                for batch in make_batches(reads, lanes=lanes):
                    out.extend(zip(batch.names, eng.query_batch(batch)))
                return out
            if use_paired_search(self.ix.r, self.ix.sigma, force=paired):
                from .engine.fused_search2 import (
                    Fused2KmerCountEngine, build_fused_search2_index)

                if self._paired_search is None:
                    from .engine.fused_search2 import (Fused2CountEngine,
                                                       Fused2ZMLEngine)

                    s2 = build_fused_search2_index(self.ix)
                    self._paired_search = (Fused2CountEngine(s2),
                                           Fused2ZMLEngine(s2))
                eng = Fused2KmerCountEngine(self._paired_search[0].s2, k)
                out = []
                for batch in make_batches(reads, lanes=lanes):
                    out.extend(zip(batch.names, eng.query_batch(batch)))
                return out
            from .engine.fused_kmer import FusedKmerCountEngine
            from .engine.fused_search import build_fused_search_index

            eng = FusedKmerCountEngine(
                build_fused_search_index(self.ix), k)
            out = []
            for batch in make_batches(reads, lanes=lanes):
                out.extend(zip(batch.names, eng.query_batch(batch)))
            return out
        if jax and not counts and self._is_bounded():
            # device membership machine (look-ahead probe + ftab anchors
            # on ACGT indexes)
            from .engine.fused_kmer import FusedKmerEngine
            from .engine.fused_search import build_fused_search_index

            fk = 0
            if bytes(self.ix.alphabet) == b"ACGT":
                fk = min(10, k - k // 3)
                if fk <= 1:
                    fk = 0
            if self._kmer_si is None or self._kmer_si[0] != fk:
                self._kmer_si = (fk, build_fused_search_index(
                    self.ix, ftab_k=fk))
            eng = FusedKmerEngine(self._kmer_si[1], k)
            out = []
            for batch in make_batches(reads, lanes=lanes):
                out.extend(zip(batch.names, eng.query_batch(batch)))
            return out
        eng = self.scalar
        if counts:
            return [(n, eng.count_kmers_bidirectional(s, k))
                    for n, s in reads]
        return [(n, eng.query_all_kmers(s, k)) for n, s in reads]

    def multi_classify(self, reads: Reads, color_table, lanes: int = 8192,
                       jax: bool = True, paired: Optional[bool] = None,
                       **color_kw):
        """Movi Color multi-class classification: [(name, csv_cell)].
        paired: True forces the paired 32 B color records, False the
        one-step layout; None auto-selects by capacity (engine/select)."""
        reads = _as_reads(reads)
        if jax and self.ix.thr is not None and self._is_bounded():
            from .engine.select import use_paired_color

            if use_paired_color(self.ix.r, self.ix.sigma,
                                len(color_table.unique_doc_sets),
                                force=paired):
                from .engine.fused2 import (Fused2ColorEngine,
                                            build_fused2_color_index)

                eng = Fused2ColorEngine(
                    build_fused2_color_index(self._ensure_fused().fi,
                                             color_table),
                    color_table, **color_kw)
            else:
                from .engine.fused_color import (FusedColorEngine,
                                                 build_fused_color_index)

                eng = FusedColorEngine(
                    build_fused_color_index(self.ix, color_table),
                    color_table, **color_kw)
            out = []
            for batch in make_batches(reads, lanes=lanes):
                out.extend((n, cell) for n, (_, cell, _)
                           in zip(batch.names, eng.query_batch(batch)))
            return out
        from .color import ColorEngine

        eng = ColorEngine(self.ix, color_table, **color_kw)
        return [(n, eng.query_pml_multiclass(s)[1]) for n, s in reads]

    def classify(self, reads: Reads, nulldb=None, bin_width: int = 150):
        """Binary SPUMONI classification: [(name, found)]."""
        from .classify import Classifier, EmpNullDatabase

        reads = _as_reads(reads)
        if nulldb is None:
            raise ValueError("classify requires a null database "
                             "(build one with movi_tpu.classify)")
        cl = Classifier(nulldb, bin_width=bin_width)
        out = []
        for name, pmls in self.query_pml(reads):
            found, *_ = cl.classify(pmls)
            out.append((name, found))
        return out


def build_index(fasta, **kw) -> Index:
    return Index.build(fasta, **kw)
