"""Long-read (>512bp) regression: the device pipeline must not truncate
extension problems to the bucket ladder caps (device_align.run_band_tries
routes oversize problems to the exact scalar kernel). Oracle = the exact
host pipeline (core.pipeline.process_seqs), byte-compared.

Covers VERDICT r2 weak #2: -x ont2d/pacbio presets accept multi-kb reads.
"""

import numpy as np
import pytest

from mpibwa_tpu.core.fm import FMIndex
from mpibwa_tpu.core.opts import apply_preset, mem_opt_init
from mpibwa_tpu.core.pipeline import BSeq, process_seqs
from mpibwa_tpu.core.refseq import RefSeq


def _make_long_reads(refs, rng, lengths):
    """Sample reads from the forward reference with 5% errors + small
    indels (ont-ish), avoiding N runs."""
    reads = []
    i = 0
    while len(reads) < len(lengths):
        ln = lengths[len(reads)]
        start = int(rng.integers(0, refs.l_pac - ln - 64))
        seq = refs.ref[start : start + ln].astype(np.uint8).copy()
        if (seq >= 4).mean() > 0.05:
            continue
        # substitutions
        m = rng.random(ln) < 0.05
        seq = np.where(m, (seq + rng.integers(1, 4, ln)) % 4,
                       seq).astype(np.uint8)
        # a deletion and an insertion
        d0 = int(rng.integers(ln // 4, ln // 2))
        seq = np.concatenate([seq[:d0], seq[d0 + 3 :]])
        i0 = int(rng.integers(ln // 2, ln - 16))
        ins = rng.integers(0, 4, 4).astype(np.uint8)
        seq = np.concatenate([seq[:i0], ins, seq[i0:]])
        if len(reads) % 2:  # reverse-complement half of them
            seq = np.where(seq < 4, 3 - seq, 4)[::-1].astype(np.uint8)
        reads.append(BSeq(name=f"long{len(reads)}", seq=seq,
                          qual="I" * len(seq)))
        i += 1
    return reads


@pytest.mark.parametrize("preset", ["ont2d"])
def test_long_reads_device_matches_host(index, preset):
    from mpibwa_tpu.pipeline.device_align import DeviceAligner

    fm, refs = FMIndex.from_index(index), RefSeq(index)
    rng = np.random.default_rng(42)
    lengths = [700, 1500, 2500, 1100]

    def fresh():
        return _make_long_reads(refs, np.random.default_rng(42), lengths)

    opt_h = mem_opt_init()
    apply_preset(opt_h, preset, set())
    host = fresh()
    process_seqs(opt_h, fm, refs, host)

    opt_d = mem_opt_init()
    apply_preset(opt_d, preset, set())
    al = DeviceAligner(index, opt_d)
    dev = fresh()
    al.process_seqs(dev)

    for h, d in zip(host, dev):
        assert h.sam == d.sam, (h.name, h.sam, d.sam)


def test_long_pe_native_matches_host(index):
    """PE pairs at 400-700bp: the i16 striped rescue (l_ms*a >= 250) and
    pairing run in C on the native path; oracle = exact host pipeline."""
    from mpibwa_tpu.pipeline.device_align import DeviceAligner

    fm, refs = FMIndex.from_index(index), RefSeq(index)
    rng0 = np.random.default_rng(7)
    lengths = [400, 550, 700, 480, 620, 410]

    def fresh():
        reads = _make_long_reads(refs, np.random.default_rng(7), lengths)
        out = []
        for i in range(0, len(reads), 2):
            reads[i].name = reads[i + 1].name = f"pair{i >> 1}"
            out.append(reads[i])
            out.append(reads[i + 1])
        return out

    from mpibwa_tpu.core.opts import MEM_F_PE

    opt_h = mem_opt_init()
    opt_h.flag |= MEM_F_PE
    host = fresh()
    process_seqs(opt_h, fm, refs, host)

    opt_d = mem_opt_init()
    opt_d.flag |= MEM_F_PE
    al = DeviceAligner(index, opt_d)
    dev = fresh()
    al.process_seqs(dev)
    for h, d in zip(host, dev):
        assert h.sam == d.sam, (h.name, h.sam, d.sam)
    del rng0
