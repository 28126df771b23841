"""FASTQ parsing with the reference mains' semantics.

The mpiBWA parser (mainParallel.c:1257-1304): read name is the header token
up to the first whitespace, with a trailing "/<digit>" stripped; the comment
(rest of header) is attached only with -C.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from mpibwa_tpu.core.pipeline import BSeq
from mpibwa_tpu.index.format import NT4_TABLE


def parse_name(header: str):
    """Returns (name, comment) from a '@'-stripped FASTQ header line."""
    sp = header.find(" ")
    if sp < 0:
        for ws in "\t":
            sp2 = header.find(ws)
            if sp2 >= 0:
                sp = sp2
                break
    if sp >= 0:
        name, comment = header[:sp], header[sp + 1 :]
    else:
        name, comment = header, None
    if len(name) >= 2 and name[-2] == "/" and name[-1].isdigit():
        name = name[:-2]
    return name, comment


def encode_seq(seq: str) -> np.ndarray:
    return NT4_TABLE[np.frombuffer(seq.encode(), dtype=np.uint8)]


def read_fastq(path: str, copy_comment: bool = False,
               limit: Optional[int] = None) -> List[BSeq]:
    out: List[BSeq] = []
    with open(path) as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().rstrip("\n")
            f.readline()
            qual = f.readline().rstrip("\n")
            name, comment = parse_name(h.rstrip("\n")[1:])
            out.append(BSeq(name=name, seq=encode_seq(seq), qual=qual,
                            comment=comment if copy_comment else None))
            if limit and len(out) >= limit:
                break
    return out


def interleave(r1: List[BSeq], r2: List[BSeq]) -> List[BSeq]:
    assert len(r1) == len(r2)
    out: List[BSeq] = []
    for a, b in zip(r1, r2):
        out.append(a)
        out.append(b)
    return out


class FastqIndex:
    """Offset/length index of a FASTQ file: the streaming analog of the
    reference's per-read offset/size/base vectors (find_reads_size_and_
    offsets_mt, parallel_aux.c:332-476). Holds O(n_reads) integers instead
    of parsed records; chunks are materialized on demand with load()."""

    __slots__ = ("path", "offsets", "l_seq")

    def __init__(self, path: str, offsets: np.ndarray, l_seq: np.ndarray):
        self.path = path
        self.offsets = offsets  # (n+1,) int64 record-start byte offsets
        self.l_seq = l_seq  # (n,) int32 sequence lengths

    def __len__(self):
        return len(self.l_seq)

    def load(self, lo: int, hi: int, copy_comment: bool = False) -> List[BSeq]:
        """Materialize records [lo, hi) by reading one contiguous byte
        range (the analog of pread_fastq_chunck, parallel_aux.c:2767)."""
        if hi <= lo:
            return []
        with open(self.path, "rb") as f:
            f.seek(int(self.offsets[lo]))
            data = f.read(int(self.offsets[hi]) - int(self.offsets[lo]))
        out: List[BSeq] = []
        lines = data.split(b"\n")
        for i in range(hi - lo):
            h = lines[4 * i].decode()
            seq = lines[4 * i + 1]
            qual = lines[4 * i + 3].decode()
            name, comment = parse_name(h[1:])
            out.append(BSeq(name=name,
                            seq=NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)],
                            qual=qual,
                            comment=comment if copy_comment else None))
        return out


def scan_fastq(path: str, block: int = 8 << 20) -> FastqIndex:
    """Single streaming pass building the offset/length index with bounded
    memory (numpy newline scan per block; no per-record Python objects)."""
    rec_offsets: List[np.ndarray] = []
    seq_lens: List[np.ndarray] = []
    line_no = 0  # global line counter
    line_start = 0  # byte offset where the current line starts
    pos = 0
    with open(path, "rb") as f:
        while True:
            buf = f.read(block)
            if not buf:
                break
            arr = np.frombuffer(buf, dtype=np.uint8)
            nl = np.flatnonzero(arr == 10).astype(np.int64) + pos
            if len(nl):
                starts = np.concatenate([[line_start], nl[:-1] + 1])
                nums = line_no + np.arange(len(nl), dtype=np.int64)
                rec_offsets.append(starts[nums % 4 == 0])
                m1 = nums % 4 == 1
                seq_lens.append((nl[m1] - starts[m1]).astype(np.int32))
                line_no += len(nl)
                line_start = int(nl[-1]) + 1
            pos += len(buf)
        if line_start < pos:  # final line without trailing newline
            if line_no % 4 == 0:
                rec_offsets.append(np.array([line_start], np.int64))
            elif line_no % 4 == 1:
                seq_lens.append(np.array([pos - line_start], np.int32))
            line_no += 1
    if line_no % 4 != 0:
        raise ValueError(f"truncated FASTQ (line count {line_no}): {path}")
    offs = (np.concatenate(rec_offsets) if rec_offsets
            else np.zeros(0, np.int64))
    lens = np.concatenate(seq_lens) if seq_lens else np.zeros(0, np.int32)
    assert len(offs) == len(lens)
    offsets = np.concatenate([offs, [pos]])
    return FastqIndex(path, offsets, lens)
