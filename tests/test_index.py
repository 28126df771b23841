"""Index layer tests: file parsing, flat image roundtrip, invariants."""

import numpy as np

from mpibwa_tpu.index import format as fmt


def test_load_index_invariants(index):
    assert index.seq_len == 2 * index.l_pac
    assert index.L2[0] == 0
    assert index.L2[4] == index.seq_len
    # A/T and C/G counts must mirror (forward+reverse concatenation)
    counts = np.diff(index.L2)
    assert counts[0] == counts[3] and counts[1] == counts[2]
    n_blocks = (index.seq_len + fmt.OCC_INTERVAL - 1) // fmt.OCC_INTERVAL
    assert index.bwt_size >= n_blocks * fmt.BLOCK_U32
    assert index.sa[0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert index.n_sa == (index.seq_len + index.sa_intv) // index.sa_intv
    assert len(index.pac) == (index.l_pac + 3) // 4


def test_occ_block_consistency(index):
    """Occ counts stored at block b+1 equal counts at block b plus the bases
    packed in block b (validates our layout understanding of bwt.h:72-78)."""
    bwt = index.bwt
    n_blocks = index.seq_len // fmt.OCC_INTERVAL  # full blocks only
    blocks = bwt[: n_blocks * 16].reshape(n_blocks, 16)
    occ = blocks[:, :8].copy().view(np.uint64)  # (n_blocks, 4) LE u64
    data = blocks[:, 8:]  # (n_blocks, 8) u32, 16 bases each
    # count bases in each block
    shifts = np.arange(30, -2, -2, dtype=np.uint32)
    bases = (data[:, :, None] >> shifts[None, None, :]) & np.uint32(3)
    # the $-removed BWT: position primary is skipped in the bwt string; base
    # counting by value still must match cumulative occ deltas
    cnt = np.zeros((n_blocks, 4), dtype=np.uint64)
    for c in range(4):
        cnt[:, c] = (bases == c).sum(axis=(1, 2))
    np.testing.assert_array_equal(occ[1:], occ[:-1] + cnt[:-1])


def test_image_roundtrip(index, tmp_path):
    p = str(tmp_path / "idx.tpumap")
    fmt.save_image(index, p)
    idx2 = fmt.load_image(p)
    assert idx2.primary == index.primary
    assert idx2.sa_intv == index.sa_intv
    np.testing.assert_array_equal(idx2.bwt, index.bwt)
    np.testing.assert_array_equal(idx2.sa, index.sa)
    np.testing.assert_array_equal(idx2.pac, index.pac)
    assert idx2.anns == index.anns
    assert idx2.ambs == index.ambs
    # the image carries the unpacked forward ref as a read-only memmap so
    # co-located shard processes share ONE physical copy (map_indexes parity)
    assert isinstance(idx2.ref_fwd, np.memmap)
    np.testing.assert_array_equal(idx2.ref_fwd,
                                  fmt.unpack_pac(index.pac, index.l_pac))
    from mpibwa_tpu.core.refseq import RefSeq

    assert RefSeq(idx2).ref is idx2.ref_fwd


def test_unpack_pac(index):
    ref = fmt.unpack_pac(index.pac, index.l_pac)
    assert len(ref) == index.l_pac
    # base composition must match L2 counts on the forward strand:
    # L2 counts cover fwd+rev, and complement symmetry means fwd A+T = (L2 A)+(L2 T) / 2...
    # simply check values are in 0..3
    assert ref.max() <= 3
