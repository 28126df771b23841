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
