"""FASTA/FASTQ reading (replacement for the reference's kseq.h +
batch_loader.cpp).  Host-side streaming feeds fixed-shape padded device
batches for the TPU engine."""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np


def _open_maybe_gz(path: str):
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_fastx(path: str) -> Iterator[Tuple[str, bytes]]:
    """Yield (read id, sequence bytes) from FASTA or FASTQ (optionally gz).

    Like kseq, the read id is the header token up to the first whitespace.
    """
    with _open_maybe_gz(path) as f:
        first = f.peek(1)[:1] if hasattr(f, "peek") else None
        line = f.readline()
        if not line:
            return
        if line.startswith(b"@"):
            # FASTQ
            while line:
                name = line[1:].rstrip(b"\r\n").split()[0].decode()
                seq = f.readline().rstrip(b"\r\n")
                f.readline()  # +
                f.readline()  # quals
                yield name, bytes(seq)
                line = f.readline()
        elif line.startswith(b">"):
            # FASTA (possibly multi-line)
            name = line[1:].rstrip(b"\r\n").split()[0].decode()
            chunks: List[bytes] = []
            for raw in f:
                s = raw.rstrip(b"\r\n")
                if s.startswith(b">"):
                    yield name, b"".join(chunks)
                    name = s[1:].split()[0].decode() if len(s) > 1 else ""
                    chunks = []
                else:
                    chunks.append(s)
            yield name, b"".join(chunks)
        else:
            raise ValueError(f"Unrecognized read file format: {path}")


@dataclass
class ReadBatch:
    """A fixed-shape padded batch of reads for the device engine.

    seqs[lane, pos] are raw byte values, right-aligned at column L-1 so the
    right-to-left scan starts at the same column for every lane; positions
    before a read's start hold 255 (padding).
    """

    names: List[str]
    seqs: np.ndarray     # uint8 [lanes, L]
    lengths: np.ndarray  # int32 [lanes]

    @property
    def lanes(self) -> int:
        return self.seqs.shape[0]

    @property
    def width(self) -> int:
        return self.seqs.shape[1]


PAD_BYTE = 255


def _width_bucket(w: int) -> int:
    """Round the batch width up to a small set of buckets so jit compiles
    stay bounded across variable-length read files (nanopore etc.)."""
    if w <= 64:
        return 64
    b = 64
    while b < w:
        b += b // 2 if b >= 256 else b  # 64,128,256,384,576,864,...
    return b


def make_batches(reads: List[Tuple[str, bytes]], lanes: int,
                 width: int | None = None, reverse: bool = False,
                 bucket_widths: bool = True) -> Iterator[ReadBatch]:
    """Pack reads into padded [lanes, width] batches (right-aligned)."""
    for start in range(0, len(reads), lanes):
        chunk = reads[start : start + lanes]
        w = width or max(len(s) for _, s in chunk)
        if width is None and bucket_widths:
            w = _width_bucket(w)
        nlanes = lanes if width else len(chunk)
        seqs = np.full((nlanes, w), PAD_BYTE, dtype=np.uint8)
        lengths = np.zeros(nlanes, dtype=np.int32)
        names = []
        for i, (name, s) in enumerate(chunk):
            if reverse:
                s = s[::-1]
            b = np.frombuffer(s, dtype=np.uint8)[:w]
            seqs[i, w - len(b):] = b
            lengths[i] = len(b)
            names.append(name)
        yield ReadBatch(names=names, seqs=seqs, lengths=lengths)
