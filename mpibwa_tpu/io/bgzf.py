"""BGZF block writer (bgzf.c semantics: 64 KiB blocks + EOF magic).

The reference's "BAM" output mode is BGZF-compressed SAM text (SURVEY §1-L3,
mainParallel.c:1509-1516) — the same writer serves -b and -g, differing only
in which header bytes are prepended. Blocks hold whole SAM records up to the
64 KiB payload bound (compress_and_write_bgzf_thread packs line-wise,
parallel_aux.c:2941-3073).
"""

from __future__ import annotations

import struct
import zlib

MAX_BLOCK_SIZE = 0x10000  # bgzf.c:59
# 28-byte BGZF EOF marker (appended by the mains, mainParallel.c:1509-1516)
BGZF_EOF = bytes([
    0x1F, 0x8B, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xFF, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1B, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00,
])
# leave headroom like deflate_block (BLOCK_HEADER/FOOTER_LENGTH = 18 + 8)
_PAYLOAD_MAX = MAX_BLOCK_SIZE - 26 - 64


def bgzf_block(data: bytes, level: int = 3) -> bytes:
    """One BGZF block: gzip member with BC extra field carrying BSIZE."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15, 8, zlib.Z_DEFAULT_STRATEGY)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25  # header(18) + footer(8) - 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 0x08, 0x04,  # gzip magic, deflate, FEXTRA
        0, 0, 0xFF,  # mtime, xfl, os
        6,  # xlen
        0x42, 0x43, 2,  # BC, slen
        bsize,
    )
    footer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                         len(data) & 0xFFFFFFFF)
    return header + comp + footer


class BGZFWriter:
    """Record-preserving BGZF stream writer."""

    def __init__(self, fileobj, level: int = 3):
        self.f = fileobj
        self.level = level
        self.buf = bytearray()

    def write_record(self, rec: bytes):
        if len(self.buf) + len(rec) > _PAYLOAD_MAX and self.buf:
            self.flush_block()
        if len(rec) > _PAYLOAD_MAX:  # oversized record: split raw
            for off in range(0, len(rec), _PAYLOAD_MAX):
                self.buf += rec[off : off + _PAYLOAD_MAX]
                self.flush_block()
        else:
            self.buf += rec

    def flush_block(self):
        if self.buf:
            self.f.write(bgzf_block(bytes(self.buf), self.level))
            self.buf = bytearray()

    def close(self, write_eof: bool = True):
        self.flush_block()
        if write_eof:
            self.f.write(BGZF_EOF)


def pack_records(records, level: int = 3) -> bytes:
    """Whole-record block packing with the reference writer's rules
    (compress_and_write_bgzf_thread, parallel_aux.c:3000-3057): each block
    greedily takes whole records while the uncompressed payload stays
    <= MAX_BLOCK_SIZE; the record that would overflow starts the next
    block. Records larger than one block are split at the payload bound
    (the reference's fixed 64 KiB buffer cannot represent that case).
    Returns a self-contained run of BGZF blocks ending on a record
    boundary."""
    out = bytearray()
    buf = bytearray()
    for rec in records:
        if buf and len(buf) + len(rec) > MAX_BLOCK_SIZE:
            out += bgzf_block(bytes(buf), level)
            buf.clear()
        if len(rec) > MAX_BLOCK_SIZE:
            for off in range(0, len(rec), _PAYLOAD_MAX):
                piece = rec[off : off + _PAYLOAD_MAX]
                if len(piece) == _PAYLOAD_MAX:
                    out += bgzf_block(piece, level)
                else:
                    buf += piece  # tail rides with the following records
        else:
            buf += rec
    if buf:
        out += bgzf_block(bytes(buf), level)
    return bytes(out)
