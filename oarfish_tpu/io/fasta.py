"""FASTA/FASTQ reading with transparent gzip, format sniffing, and
U→T normalization.

Equivalents: `needletail`/`niffler` usage in the reference's read mode
(`bulk.rs:768-829`), `is_fasta` sniffing (`file_utils.rs:55-65`), and the
uracil normalization applied on read ingestion
(`oarfish_types.rs:114-136`, COMBINE-lab/oarfish#70).
"""

from __future__ import annotations

import gzip
from pathlib import Path
from typing import Iterator, List, Tuple

_U2T = bytes.maketrans(b"Uu", b"Tt")


def _open_text(path):
    path = str(path)
    with open(path, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path)


def sniff_format(path) -> str:
    """'fasta', 'fastq', 'bam', or 'unknown' by first byte(s)
    (`file_utils.rs:55-65`, `bulk.rs:696-730`)."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic[:2] == b"\x1f\x8b":
        import zlib

        with open(path, "rb") as fh:
            head = fh.read(1 << 16)
        try:
            payload = zlib.decompressobj(wbits=31).decompress(head, 16)
        except zlib.error:
            return "unknown"
        magic = payload[:4]
    if magic[:4] == b"BAM\x01":
        return "bam"
    if magic[:1] == b">":
        return "fasta"
    if magic[:1] == b"@":
        return "fastq"
    return "unknown"


def is_fasta(path) -> bool:
    return sniff_format(path) == "fasta"


def _iter_fasta_blob(path) -> Iterator[Tuple[str, bytes]]:
    """Whole-blob FASTA parse: one read, one split on record starts,
    and a single C-level translate per record that both deletes line
    breaks and applies U->T. ~50x the line-loop at Gbp genome scale
    (the line loop handled ~11M Python-level lines for a 0.9 Gbp
    80-column FASTA)."""
    p = str(path)
    with open(p, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        with gzip.open(p, "rb") as fh:
            blob = fh.read()
    else:
        with open(p, "rb") as fh:
            blob = fh.read()
    recs = blob.split(b"\n>")
    del blob  # drop the second whole-genome copy the split materialized
    for i in range(len(recs)):
        rec = recs[i]
        recs[i] = None  # progressively release consumed records
        if i == 0:
            if not rec.startswith(b">"):
                continue  # leading junk before the first record
            rec = rec[1:]
        nl = rec.find(b"\n")
        hdr = rec[:nl] if nl >= 0 else rec
        body = rec[nl + 1:] if nl >= 0 else b""
        toks = hdr.split()
        name = toks[0].decode() if toks else ""
        yield name, body.translate(_U2T, delete=b"\r\n")


def iter_fastx(path) -> Iterator[Tuple[str, bytes]]:
    """Yield (name, seq bytes with U->T applied). Name is the first
    whitespace-delimited token (`oarfish_types.rs:66-72`)."""
    fmt = sniff_format(path)
    if fmt == "fasta":
        yield from _iter_fasta_blob(path)
    elif fmt == "fastq":
        with _open_text(path) as fh:
            while True:
                hdr = fh.readline()
                if not hdr:
                    break
                seq = fh.readline().rstrip("\n")
                fh.readline()  # +
                fh.readline()  # qual
                name = hdr[1:].split()[0] if len(hdr) > 1 else ""
                yield name, seq.encode().translate(_U2T)
    elif fmt == "bam":
        # uBAM: names + sequences from unaligned records
        from .bam import BamReader

        reader = BamReaderWithSeq(path)
        yield from reader
    else:
        raise ValueError(f"cannot determine the format of {path}")


class BamReaderWithSeq:
    """Minimal uBAM sequence reader (names + unpacked sequences)."""

    _NIBBLE = "=ACMGRSVTWYHKDBN"

    def __init__(self, path):
        self.path = path

    def __iter__(self):
        import struct

        from . import bgzf

        data = bgzf.read_all(self.path)
        if data[:4] != b"BAM\x01":
            raise ValueError("not a BAM file")
        (l_text,) = struct.unpack_from("<i", data, 4)
        off = 8 + l_text
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", data, off)
            off += 4 + l_name + 4
        while off + 4 <= len(data):
            (block_size,) = struct.unpack_from("<i", data, off)
            r = off + 4
            off = r + block_size
            l_read_name = data[r + 8]
            (n_cigar,) = struct.unpack_from("<H", data, r + 12)
            (l_seq,) = struct.unpack_from("<i", data, r + 16)
            name = data[r + 32 : r + 32 + l_read_name - 1].decode()
            sq = r + 32 + l_read_name + 4 * n_cigar
            packed = data[sq : sq + (l_seq + 1) // 2]
            seq = bytearray()
            for i in range(l_seq):
                b = packed[i // 2]
                seq.append(ord(self._NIBBLE[(b >> 4) if i % 2 == 0 else (b & 0xF)]))
            yield name.split()[0] if name else "", bytes(seq).translate(_U2T)


def read_fasta_concat(paths) -> Tuple[List[str], List[bytes]]:
    """Concatenate records of several FASTA files in order (the
    annotated+novel concat of `file_utils.rs:98-216`, without the fifo)."""
    names: List[str] = []
    seqs: List[bytes] = []
    for p in paths:
        if p is None:
            continue
        for name, seq in iter_fastx(p):
            names.append(name)
            seqs.append(seq)
    return names, seqs
