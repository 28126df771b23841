"""Pallas TPU kernel: fused occ4 + bwt_extend arithmetic.

Round-2 groundwork (see DESIGN.md roadmap). Profiling showed the backward
automaton's per-round cost is XLA materializing each op of the round body
through HBM; the fix is fusing the arithmetic into one kernel that keeps the
per-entry state in VMEM. The BWT block gather itself stays in XLA (a
per-entry DMA cannot beat the XLA gather at 32-96 B rows), so this kernel
consumes the two pre-gathered word rows per entry and produces the full
(E, 4, 3) bwt_extend output (bwt.c:262-275 + the bwt_occ4 SWAR counting of
bwt.c:98-105,165-186) in one pass.

Not wired into the pipeline yet (MPIBWA_PALLAS=1 enables it in
DeviceFMIndex.extend); differential-tested against the XLA path in
interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BE = 1024  # max entries per grid block


def block_for(E: int) -> int:
    """Grid block size for an entry count (smaller pow2 batches use one
    block; capacities in this codebase are multiples of 256)."""
    return BE if E >= BE else max(E, 1)

# plain ints: jnp scalars would be captured as tracer constants inside the
# pallas kernel body
M55 = 0x55555555
M33 = 0x33333333
M0F = 0x0F0F0F0F


def _occ4_words(words, within):
    """(8, BE) u32 words + (BE,) i32 within-block offsets -> 4 x (BE,) i32
    base counts over the first within+1 bases (before the base-0 overcount
    correction). Entry-major-last layout: the lane dimension is the entry, so
    VMEM tiles stay dense (a (BE, small) layout pads the small dim to 128
    lanes and blows the VMEM budget)."""
    widx = jax.lax.broadcasted_iota(jnp.int32, (8, words.shape[1]), 0)
    # numpy scalars + lax.max/min: Python-int scalars recurse in the Mosaic
    # tracing path, and module-level jnp scalars are rejected as captured
    # constants
    nvalid = lax.min(lax.max(within[None, :] + 1 - widx * 16, np.int32(0)),
                     np.int32(16))
    half = (16 - nvalid).astype(jnp.uint32)
    v = lax.shift_left(np.uint32(1), half)
    mask = ~(v * v - np.uint32(1))
    w = words & mask
    nw = ~w
    cnts = []
    for c in range(4):
        a = (w if c & 2 else nw) >> 1
        b = w if c & 1 else nw
        m = a & b & np.uint32(M55)
        x = (m & np.uint32(M33)) + ((m >> 2) & np.uint32(M33))
        x = (x + (x >> 4)) & np.uint32(M0F)
        cnt = ((x * np.uint32(0x01010101)) >> 24).astype(jnp.int32)
        cnts.append(cnt.sum(axis=0, dtype=jnp.int32))
    corr = (np.int32(16) - nvalid).sum(axis=0, dtype=jnp.int32)
    cnts[0] = cnts[0] - corr
    return cnts  # list of 4 (BE,) i32


def _extend_kernel(ik_ref, wk_ref, wl_ref, occk_ref, occl_ref, wk_in_ref,
                   wl_in_ref, sent_ref, l2_ref, prim_ref, col_ref, out_ref):
    ik = ik_ref[...]  # (3, BE) i32
    ck = _occ4_words(wk_ref[...], wk_in_ref[...])
    cl = _occ4_words(wl_ref[...], wl_in_ref[...])
    sent = sent_ref[...] != 0  # (2, BE): [k-1 sentinel, k-1+x2 sentinel]
    prim = prim_ref[0]
    col = col_ref[0]  # 0 backward, 1 forward (static per call in practice)
    l2 = l2_ref[...]  # (8,) i32, first 4 used

    ikc = jnp.where(col == 0, ik[0, :], ik[1, :])
    iko = jnp.where(col == 0, ik[1, :], ik[0, :])

    tk = [jnp.where(sent[0, :], np.int32(0), occk_ref[...][c, :] + ck[c])
          for c in range(4)]
    tl = [jnp.where(sent[1, :], np.int32(0), occl_ref[...][c, :] + cl[c])
          for c in range(4)]
    okx2 = [tl[c] - tk[c] for c in range(4)]
    ok_main = [l2[c] + 1 + tk[c] for c in range(4)]
    add = ((ikc <= prim) & (ikc + ik[2, :] - 1 >= prim)).astype(jnp.int32)
    ok3 = iko + add
    okb2 = ok3 + okx2[3]
    okb1 = okb2 + okx2[2]
    okb0 = okb1 + okx2[1]
    ok_oth = [okb0, okb1, okb2, ok3]

    for c in range(4):
        a = jnp.where(col == 0, ok_main[c], ok_oth[c])
        b = jnp.where(col == 0, ok_oth[c], ok_main[c])
        out_ref[c, 0, :] = a
        out_ref[c, 1, :] = b
        out_ref[c, 2, :] = okx2[c]


@functools.partial(jax.jit, static_argnums=(2, 3))
def extend_pallas(fm, ik: jnp.ndarray, is_back: int,
                  interpret: bool = False) -> jnp.ndarray:
    """bwt_extend over (E, 3) int32 intervals via the fused Pallas kernel.
    Gathers the block rows in XLA, fuses all counting/arithmetic in VMEM.
    Matches DeviceFMIndex.extend (int32 interval dtype path)."""
    from jax.experimental import pallas as pl

    E = ik.shape[0]
    be = block_for(E)
    assert E % be == 0, "pad entry count to a multiple of the block"
    col = 0 if is_back else 1
    kq = ik[:, col] - 1
    l = kq + ik[:, 2]

    def prep(pos):
        sentinel = pos < 0
        p = jnp.where(sentinel, 0, pos)
        p = p - (p >= fm.primary)
        blk = (p >> 7).astype(jnp.int32)
        within = (p & 127).astype(jnp.int32)
        return fm.data[blk].T, fm.occ[blk].T, within, sentinel

    wk, occk, wk_in, sent_k = prep(kq)
    wl, occl, wl_in, sent_l = prep(l)
    sent = jnp.stack([sent_k, sent_l], axis=0).astype(jnp.int32)
    l2 = jnp.pad(fm.L2[:4].astype(jnp.int32), (0, 4))
    prim = jnp.full((1,), fm.primary, jnp.int32)
    colv = jnp.full((1,), col, jnp.int32)

    grid = (E // be,)
    z = np.int32(0)  # python-int 0 would trace as i64 under jax_enable_x64
    # entry axis LAST so VMEM tiles are dense (lane dim = entries)
    ebs = lambda lead: pl.BlockSpec(lead + (be,),
                                    lambda i: (z,) * len(lead) + (i,))
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (z,) * len(shape))
    out = pl.pallas_call(
        _extend_kernel,
        grid=grid,
        in_specs=[ebs((3,)), ebs((8,)), ebs((8,)), ebs((4,)), ebs((4,)),
                  ebs(()), ebs(()), ebs((2,)), rep((8,)), rep((1,)),
                  rep((1,))],
        out_specs=ebs((4, 3)),
        out_shape=jax.ShapeDtypeStruct((4, 3, E), jnp.int32),
        interpret=interpret,
    )(ik.T, wk, wl, occk, occl, wk_in, wl_in, sent, l2, prim, colv)
    return out.transpose(2, 0, 1)
