"""Device-resident FM-index and batched rank/extension primitives (JAX).

The interleaved occ/BWT blocks live in HBM as a (n_blocks, 16) uint32 array
(layout per bwt.h:72-78: 4 LE u64 cumulative counts + 8 u32 of 128 packed
bases). A batched occ4 is one gather of the 16-word block plus vectorized
2-bit counting — the device analog of bwt_occ4 (bwt.c:169-186).

Positions/interval bounds use int64 (human genome doubled exceeds 2^32);
gather indices and per-block counts stay int32 for TPU efficiency.
"""

from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


class DeviceFMIndex:
    """HBM-resident index arrays + batched primitives."""

    def __init__(self, idx, device=None):
        n_blocks = len(idx.bwt) // 16
        blocks = np.ascontiguousarray(idx.bwt[: n_blocks * 16]).reshape(n_blocks, 16)
        occ = blocks[:, :8].copy().view(np.uint64)
        if occ.max() > np.iinfo(np.int32).max:
            raise ValueError("occ counts exceed int32; unsupported genome size")
        put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
        self.occ = put(occ.astype(np.int32))  # (n_blocks, 4)
        self.data = put(np.ascontiguousarray(blocks[:, 8:]))  # (n_blocks, 8) u32
        self.L2 = put(np.asarray(idx.L2, dtype=np.int64))  # (5,)
        self.primary = int(idx.primary)
        self.seq_len = int(idx.seq_len)
        self.sa_intv = int(idx.sa_intv)
        self.sa = put(np.asarray(idx.sa).view(np.int64))  # (n_sa,)

    # -- batched occ4 --------------------------------------------------------

    def occ4(self, ks: jnp.ndarray) -> jnp.ndarray:
        """(N,) int64 positions (negative = sentinel -1) -> (N,4) int64."""
        sent = ks < 0
        k = jnp.where(sent, 0, ks)
        k = k - (k >= self.primary)
        blk = (k >> 7).astype(jnp.int32)
        within = (k & 127).astype(jnp.int32)
        words = self.data[blk]  # (N, 8) uint32
        shifts = jnp.arange(30, -2, -2, dtype=jnp.uint32)  # MSB-first pairs
        bases = (words[..., None] >> shifts) & jnp.uint32(3)  # (N, 8, 16)
        pos = (jnp.arange(8, dtype=jnp.int32)[:, None] * 16
               + jnp.arange(16, dtype=jnp.int32)[None, :])  # (8, 16)
        live = pos[None, :, :] <= within[:, None, None]
        cnt = jnp.stack(
            [((bases == c) & live).sum(axis=(1, 2)).astype(jnp.int32)
             for c in range(4)], axis=-1)  # (N, 4) int32
        out = (self.occ[blk] + cnt).astype(jnp.int64)
        return jnp.where(sent[:, None], jnp.int64(0), out)

    def bwt_b0(self, k: jnp.ndarray) -> jnp.ndarray:
        """Base at position k of the $-removed BWT (bwt_B0). k >= 0."""
        blk = (k >> 7).astype(jnp.int32)
        within = (k & 127).astype(jnp.int32)
        word = self.data[blk, within >> 4]
        shift = ((~within & 15) << 1).astype(jnp.uint32)
        return ((word >> shift) & jnp.uint32(3)).astype(jnp.int32)

    # -- batched bidirectional extension (bwt_extend, bwt.c:262-275) ---------

    def extend(self, ik: jnp.ndarray, is_back: int) -> jnp.ndarray:
        """ik: (..., 3) int64 intervals -> ok: (..., 4, 3) for the 4 bases."""
        shape = ik.shape[:-1]
        ikf = ik.reshape(-1, 3)
        col = 0 if is_back else 1  # x[!is_back]
        oth = 1 - col
        kq = ikf[:, col] - 1
        tk = self.occ4(kq)
        tl = self.occ4(kq + ikf[:, 2])
        okx2 = tl - tk  # (N, 4)
        ok_main = self.L2[None, :4] + 1 + tk  # x[!is_back] of ok
        add = ((ikf[:, col] <= self.primary)
               & (ikf[:, col] + ikf[:, 2] - 1 >= self.primary)).astype(jnp.int64)
        ok3 = ikf[:, oth] + add
        # ok[c].x[is_back]: cumulative suffix sums of sizes from c=3 down
        # ok[2]=ok[3]+s3; ok[1]=ok[2]+s2; ok[0]=ok[1]+s1
        s = okx2
        okb3 = ok3
        okb2 = okb3 + s[:, 3]
        okb1 = okb2 + s[:, 2]
        okb0 = okb1 + s[:, 1]
        ok_oth = jnp.stack([okb0, okb1, okb2, okb3], axis=-1)  # (N, 4)
        ok = jnp.empty((ikf.shape[0], 4, 3), dtype=jnp.int64)
        ok = ok.at[:, :, col].set(ok_main)
        ok = ok.at[:, :, oth].set(ok_oth)
        ok = ok.at[:, :, 2].set(okx2)
        return ok.reshape(*shape, 4, 3)

    # -- batched set_intv ----------------------------------------------------

    def set_intv(self, c: jnp.ndarray) -> jnp.ndarray:
        """(N,) base codes (<4) -> (N,3) initial single-base intervals."""
        x0 = self.L2[c] + 1
        x2 = self.L2[c + 1] - self.L2[c]
        x1 = self.L2[3 - c] + 1
        return jnp.stack([x0, x1, x2], axis=-1)

    # -- batched SA lookup (bwt_sa, bwt.c:86-96) -----------------------------

    def sa_lookup(self, ks: jnp.ndarray) -> jnp.ndarray:
        """(N,) int64 SA indices -> (N,) int64 positions."""
        mask = self.sa_intv - 1

        def inv_psi(k):
            x = k - (k > self.primary)
            c = self.bwt_b0(x)
            # occ(k, c): bwt_occ semantics incl. k == seq_len
            occ_all = self.occ4(k)
            occc = jnp.take_along_axis(occ_all, c[:, None].astype(jnp.int64),
                                       axis=1)[:, 0]
            at_end = k == self.seq_len
            occc = jnp.where(at_end, self.L2[c + 1] - self.L2[c], occc)
            val = self.L2[c] + occc
            return jnp.where(k == self.primary, jnp.int64(0), val)

        def cond(state):
            k, _, act = state
            return jnp.any(act)

        def body(state):
            k, steps, act = state
            k2 = inv_psi(k)
            k = jnp.where(act, k2, k)
            steps = steps + act.astype(jnp.int64)
            act = (k & mask) != 0
            return k, steps, act

        steps0 = jnp.zeros_like(ks)
        act0 = (ks & mask) != 0
        k, steps, _ = jax.lax.while_loop(cond, body, (ks, steps0, act0))
        base = self.sa[(k // self.sa_intv).astype(jnp.int32)]
        return steps + base  # sa[0] == -1 wraps exactly like the C uint64
