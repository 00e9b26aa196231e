"""The CSR alignment store and per-transcript coverage state.

TPU-era equivalent of `InMemoryAlignmentStore` + `TranscriptInfo`
(`oarfish_types.rs:547-759`, `:430-545`): for every retained read a
contiguous slice of alignments with parallel probability arrays, delimited
by a `boundaries` offsets vector. Here the store is a set of flat numpy
arrays ready to ship to device HBM, and coverage binning
(`TranscriptInfo::add_interval`, `oarfish_types.rs:496-538`) is a
vectorized pass instead of a per-record scalar loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .filters import DiscardTable, FilteredGroup


def _rust_round(x: np.ndarray) -> np.ndarray:
    """Rust f64::round = round half away from zero (numpy rounds half to
    even, which differs on exact .5 values — parity-critical for the
    `bin_width` recomputation at `oarfish_types.rs:475,501`)."""
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


class TranscriptCoverage:
    """Per-transcript coverage-bin accumulators (ragged, CSR over
    transcripts). `bin_width == 0` means the coverage model is off and no
    bins are kept (matching `TranscriptInfo::with_len`, which still holds a
    10-bin placeholder the model never reads)."""

    def __init__(self, txp_len: np.ndarray, bin_width: int):
        self.txp_len = np.asarray(txp_len, dtype=np.int64)
        self.lenf = self.txp_len.astype(np.float64)
        self.bin_width = int(bin_width)
        T = len(self.txp_len)
        if bin_width > 0:
            # nbins = ceil(len / bin_width)  (`oarfish_types.rs:464`)
            self.nbins = np.ceil(self.lenf / float(bin_width)).astype(np.int64)
        else:
            self.nbins = np.full(T, 10, dtype=np.int64)
        self.bin_offsets = np.zeros(T + 1, dtype=np.int64)
        np.cumsum(self.nbins, out=self.bin_offsets[1:])
        self.bins = np.zeros(int(self.bin_offsets[-1]), dtype=np.float64)
        self.total_weight = np.zeros(T, dtype=np.float64)
        # rounded per-transcript bin width used inside add_interval
        # (`oarfish_types.rs:501`: bin_width = round(tlen / num_intervals))
        self.rbw = _rust_round(self.lenf / self.nbins.astype(np.float64))

    def add_intervals(
        self, tid: np.ndarray, start: np.ndarray, end: np.ndarray
    ) -> None:
        """Vectorized `add_interval(start, end, 1.0)` over many alignments
        (`oarfish_types.rs:496-538`)."""
        tid = np.asarray(tid, dtype=np.int64)
        if tid.size == 0:
            return
        start = np.asarray(start, dtype=np.float64)
        end = np.asarray(end, dtype=np.float64)
        s = np.minimum(start, end)
        e = np.maximum(s, end)

        np.add.at(self.total_weight, tid, 1.0)

        tlen = self.lenf[tid]
        nb = self.nbins[tid].astype(np.float64)
        start_bin = np.floor(s / tlen * nb).astype(np.int64)
        end_bin = np.floor(e / tlen * nb).astype(np.int64)

        # ragged expansion: one row per (alignment, covered bin)
        counts = np.maximum(end_bin - start_bin, 0)
        total = int(counts.sum())
        if total == 0:
            return
        rep = np.repeat(np.arange(len(tid)), counts)
        # local bin index within [start_bin, end_bin)
        first = np.zeros(len(tid) + 1, dtype=np.int64)
        np.cumsum(counts, out=first[1:])
        local = np.arange(total, dtype=np.int64) - first[:-1][rep] + start_bin[rep]

        bw = self.rbw[tid][rep]
        tl = tlen[rep]
        # u32 truncation of the f64 products (`oarfish_types.rs:520-521`)
        cbs = (local.astype(np.float64) * bw).astype(np.int64)
        cbe = np.minimum((local + 1).astype(np.float64) * bw, tl).astype(np.int64)

        s_r = s[rep].astype(np.int64)
        e_r = e[rep].astype(np.int64)
        olap = np.where(
            s_r <= cbe,
            np.minimum(e_r, cbe) - np.maximum(s_r, cbs),
            0,
        )
        width = cbe - cbs
        frac = olap.astype(np.float64) / width.astype(np.float64)
        np.add.at(self.bins, self.bin_offsets[tid[rep]] + local, frac)

    def normalized_counts_and_lengths(self):
        """Flat (counts f32, widths f32) per bin, matching
        `get_normalized_counts_and_lengths` (`oarfish_types.rs:471-493`)."""
        T = len(self.txp_len)
        local = np.arange(len(self.bins), dtype=np.int64) - np.repeat(
            self.bin_offsets[:-1], self.nbins
        )
        t_of_bin = np.repeat(np.arange(T, dtype=np.int64), self.nbins)
        bwf = _rust_round(self.lenf / self.nbins.astype(np.float64)).astype(
            np.float32
        )[t_of_bin]
        bidxf = local.astype(np.float32)
        bin_start = bidxf * bwf
        bin_end = np.minimum(
            (bidxf + np.float32(1.0)) * bwf, self.lenf.astype(np.float32)[t_of_bin]
        )
        return self.bins.astype(np.float32), (bin_end - bin_start)


@dataclass
class AlignmentStore:
    """Flat CSR of read×alignment records (device-ready numpy arrays)."""

    txp_id: np.ndarray  # int32 [A]
    start: np.ndarray  # int64 [A] (1-based)
    end: np.ndarray  # int64 [A] (1-based inclusive)
    as_prob: np.ndarray  # float32 [A]
    cov_prob: np.ndarray  # float64 [A]
    boundaries: np.ndarray  # int64 [R+1]
    discard: DiscardTable
    num_unique_alignments: int = 0
    read_names: Optional[List[str]] = None

    @property
    def num_reads(self) -> int:
        return len(self.boundaries) - 1

    @property
    def num_alignments(self) -> int:
        return len(self.txp_id)

    def read_ids(self) -> np.ndarray:
        """Segment id per alignment (the CSR row index expansion)."""
        lens = np.diff(self.boundaries)
        return np.repeat(np.arange(self.num_reads, dtype=np.int32), lens)

    def iter_groups(self):
        for r in range(self.num_reads):
            s, e = self.boundaries[r], self.boundaries[r + 1]
            yield slice(int(s), int(e))


class StoreBuilder:
    """Appends filtered groups and finalizes into an `AlignmentStore`."""

    def __init__(self, coverage: TranscriptCoverage, keep_names: bool = False):
        self.coverage = coverage
        self._txp: List[np.ndarray] = []
        self._start: List[np.ndarray] = []
        self._end: List[np.ndarray] = []
        self._prob: List[np.ndarray] = []
        self._sizes: List[int] = []
        self.discard = DiscardTable()
        self.num_unique_alignments = 0
        self.read_names: Optional[List[str]] = [] if keep_names else None

    def add_filtered_group(
        self, g: FilteredGroup, name: Optional[str] = None
    ) -> bool:
        """Equivalent of `add_filtered_group` (`oarfish_types.rs:718-738`):
        records the group, updates coverage bins, pushes a boundary."""
        if g is None or len(g.txp_id) == 0:
            return False
        self.coverage.add_intervals(g.txp_id, g.start, g.end)
        self._txp.append(g.txp_id)
        self._start.append(g.start)
        self._end.append(g.end)
        self._prob.append(g.prob)
        self._sizes.append(len(g.txp_id))
        if self.read_names is not None:
            self.read_names.append(name if name is not None else "")
        return True

    def finalize(self) -> AlignmentStore:
        txp = (
            np.concatenate(self._txp)
            if self._txp
            else np.empty(0, np.int32)
        )
        boundaries = np.zeros(len(self._sizes) + 1, dtype=np.int64)
        np.cumsum(self._sizes, out=boundaries[1:])
        return AlignmentStore(
            txp_id=txp.astype(np.int32),
            start=(
                np.concatenate(self._start) if self._start else np.empty(0, np.int64)
            ),
            end=np.concatenate(self._end) if self._end else np.empty(0, np.int64),
            as_prob=(
                np.concatenate(self._prob)
                if self._prob
                else np.empty(0, np.float32)
            ),
            cov_prob=np.zeros(len(txp), dtype=np.float64),
            boundaries=boundaries,
            discard=self.discard,
            num_unique_alignments=self.num_unique_alignments,
            read_names=self.read_names,
        )
