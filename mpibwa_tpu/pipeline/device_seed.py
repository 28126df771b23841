"""Device-batched seed collection: exact mem_collect_intv on TPU.

Drives the ops.seeding automata over a read batch and assembles, per read,
the same interval list (same order, pre-sort) that core.chain.collect_intv
produces, then applies the exact introsort. Reads that overflow any device
buffer fall back to the scalar host engine.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from mpibwa_tpu.core.sortutil import ks_introsort
from mpibwa_tpu.ops import seeding
from mpibwa_tpu.ops.fmd import DeviceFMIndex


def _pad_batch(qs: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    B = len(qs)
    L = max((len(q) for q in qs), default=1)
    L = max(L, 8)
    out = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, q in enumerate(qs):
        out[i, : len(q)] = q
        lens[i] = len(q)
    return out, lens


class DeviceSeeder:
    """collect_intv over batches using the device automata."""

    def __init__(self, dfm: DeviceFMIndex, opt):
        self.dfm = dfm
        self.opt = opt

    def collect_batch(self, qs: List[np.ndarray]
                      ) -> Tuple[List[Optional[List[tuple]]], np.ndarray]:
        """Returns (per-read interval lists, fallback_mask). Lists are None
        for reads needing host fallback."""
        import jax.numpy as jnp

        opt = self.opt
        B = len(qs)
        q, lens = _pad_batch(qs)
        qd = jnp.asarray(q)
        lensd = jnp.asarray(lens)

        # ---- pass 1: chained smem1 calls ----
        min1 = jnp.ones(B, dtype=jnp.int64)
        fwd = seeding.forward_pass(self.dfm, qd, lensd, min1, True)
        fallback = np.asarray(fwd.overflow).copy()
        n_calls = np.asarray(fwd.n_calls)
        call_x = np.asarray(fwd.call_x)
        call_start = np.asarray(fwd.call_start)
        call_len = np.asarray(fwd.call_len)
        ivals = np.asarray(fwd.ivals)
        infos = np.asarray(fwd.infos)

        def build_bwd_lanes(reads_calls):
            """reads_calls: list of (read, start_idx, length, x, min_intv)."""
            N = max(len(reads_calls), 1)
            prev = np.zeros((N, seeding.P_CAP, 3), dtype=np.int64)
            pinfo = np.zeros((N, seeding.P_CAP), dtype=np.int64)
            n_prev = np.zeros(N, dtype=np.int32)
            x0 = np.zeros(N, dtype=np.int32)
            minv = np.ones(N, dtype=np.int64)
            qrows = np.zeros((N, q.shape[1]), dtype=np.uint8)
            lane_read = np.zeros(N, dtype=np.int32)
            for ln, (b, s0, ll, x, mi) in enumerate(reads_calls):
                if ll > seeding.P_CAP:
                    fallback[b] = True
                    ll = 0
                # reversed push order: longest match (last pushed) first
                prev[ln, :ll] = ivals[b, s0 + ll - 1 : (s0 - 1 if s0 else None) : -1]
                pinfo[ln, :ll] = infos[b, s0 + ll - 1 : (s0 - 1 if s0 else None) : -1]
                n_prev[ln] = ll
                x0[ln] = x
                minv[ln] = mi
                qrows[ln] = q[b]
                lane_read[ln] = b
            return (jnp.asarray(qrows), jnp.asarray(prev), jnp.asarray(pinfo),
                    jnp.asarray(n_prev), jnp.asarray(x0), jnp.asarray(minv),
                    lane_read)

        lanes1 = []
        for b in range(B):
            for cidx in range(n_calls[b]):
                lanes1.append((b, call_start[b, cidx], call_len[b, cidx],
                               call_x[b, cidx], 1))
        qr, pv, pi, npv, x0, mi, lane_read1 = build_bwd_lanes(lanes1)
        bwd1 = seeding.backward_pass(self.dfm, qr, pv, pi, npv, x0, mi)
        for lane in np.nonzero(np.asarray(bwd1.overflow))[0]:
            fallback[lane_read1[lane]] = True
        # lanes1 order is (read, call) ascending = the C call order
        pass1 = [[] for _ in range(B)]
        mems1 = np.asarray(bwd1.mems)
        infos1 = np.asarray(bwd1.mem_infos)
        nm1 = np.asarray(bwd1.n_mems)
        for lane in range(len(lanes1)):
            b = lanes1[lane][0]
            for j in range(nm1[lane] - 1, -1, -1):
                info = int(infos1[lane, j])
                slen = (info & 0xFFFFFFFF) - (info >> 32)
                if slen >= opt.min_seed_len:
                    pass1[b].append((int(mems1[lane, j, 0]), int(mems1[lane, j, 1]),
                                     int(mems1[lane, j, 2]), info))

        # ---- pass 2: re-seed long low-occ SMEMs from their midpoint ----
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        lanes2 = []  # (read, start_x, min_intv)
        for b in range(B):
            for iv in pass1[b]:
                start, end = iv[3] >> 32, iv[3] & 0xFFFFFFFF
                if end - start < split_len or iv[2] > opt.split_width:
                    continue
                lanes2.append((b, (start + end) >> 1, iv[2] + 1))
        pass2 = [[] for _ in range(B)]
        if lanes2:
            B2 = len(lanes2)
            q2 = np.zeros((B2, q.shape[1]), dtype=np.uint8)
            starts2 = np.zeros(B2, dtype=np.int32)
            min2 = np.ones(B2, dtype=np.int64)
            lens2 = np.zeros(B2, dtype=np.int32)
            for ln, (b, x, mi) in enumerate(lanes2):
                q2[ln] = q[b]
                lens2[ln] = lens[b]
                starts2[ln] = x
                min2[ln] = mi
            import jax.numpy as jnp2

            fwd2 = seeding.forward_pass(self.dfm, jnp2.asarray(q2),
                                        jnp2.asarray(lens2), jnp2.asarray(min2),
                                        False, jnp2.asarray(starts2))
            for ln in np.nonzero(np.asarray(fwd2.overflow))[0]:
                fallback[lanes2[ln][0]] = True
            f2_ncalls = np.asarray(fwd2.n_calls)
            f2_start = np.asarray(fwd2.call_start)
            f2_len = np.asarray(fwd2.call_len)
            f2_x = np.asarray(fwd2.call_x)
            f2_iv = np.asarray(fwd2.ivals)
            f2_info = np.asarray(fwd2.infos)
            # build backward lanes (single call per lane)
            N2 = B2
            prev = np.zeros((N2, seeding.P_CAP, 3), dtype=np.int64)
            pinfo = np.zeros((N2, seeding.P_CAP), dtype=np.int64)
            n_prev = np.zeros(N2, dtype=np.int32)
            x0 = np.zeros(N2, dtype=np.int32)
            minv = np.ones(N2, dtype=np.int64)
            for ln in range(B2):
                b = lanes2[ln][0]
                if f2_ncalls[ln] == 0:
                    continue  # ambiguous start: no mems
                ll = f2_len[ln, 0]
                s0 = f2_start[ln, 0]
                if ll > seeding.P_CAP:
                    fallback[b] = True
                    ll = 0
                prev[ln, :ll] = f2_iv[ln, s0 + ll - 1 : (s0 - 1 if s0 else None) : -1]
                pinfo[ln, :ll] = f2_info[ln, s0 + ll - 1 : (s0 - 1 if s0 else None) : -1]
                n_prev[ln] = ll
                x0[ln] = f2_x[ln, 0]
                minv[ln] = lanes2[ln][2]
            bwd2 = seeding.backward_pass(self.dfm, jnp2.asarray(q2),
                                         jnp2.asarray(prev), jnp2.asarray(pinfo),
                                         jnp2.asarray(n_prev), jnp2.asarray(x0),
                                         jnp2.asarray(minv))
            m2 = np.asarray(bwd2.mems)
            i2 = np.asarray(bwd2.mem_infos)
            nm2 = np.asarray(bwd2.n_mems)
            for ln in np.nonzero(np.asarray(bwd2.overflow))[0]:
                fallback[lanes2[ln][0]] = True
            for ln in range(B2):
                b = lanes2[ln][0]
                for j in range(nm2[ln] - 1, -1, -1):
                    info = int(i2[ln, j])
                    slen = (info & 0xFFFFFFFF) - (info >> 32)
                    if slen >= opt.min_seed_len:
                        pass2[b].append((int(m2[ln, j, 0]), int(m2[ln, j, 1]),
                                         int(m2[ln, j, 2]), info))

        # ---- pass 3 ----
        pass3_out = [[] for _ in range(B)]
        if opt.max_mem_intv > 0:
            p3 = seeding.pass3(self.dfm, qd, lensd, opt.min_seed_len,
                               opt.max_mem_intv)
            for b in np.nonzero(np.asarray(p3.overflow))[0]:
                fallback[b] = True
            s3 = np.asarray(p3.seeds)
            i3 = np.asarray(p3.infos)
            n3 = np.asarray(p3.n_seeds)
            for b in range(B):
                for j in range(n3[b]):
                    pass3_out[b].append((int(s3[b, j, 0]), int(s3[b, j, 1]),
                                         int(s3[b, j, 2]), int(i3[b, j])))

        out: List[Optional[List[tuple]]] = []
        for b in range(B):
            if fallback[b]:
                out.append(None)
                continue
            mem = pass1[b] + pass2[b] + pass3_out[b]
            ks_introsort(mem, lambda a, c: a[3] < c[3])
            out.append(mem)
        return out, fallback
