"""Device-accelerated alignment pipeline.

Flow per read batch (see DESIGN.md):
  1. device: SMEM seeding (ops.seeding automata)        — hot loop 1
  2. device: batched SA resolution (ops.fmd.sa_lookup)  — hot loop 2
  3. host:   chaining/filtering (exact, branchy, small)
  4. device: batched banded extension (ops.extend_batch) — hot loop 3,
     computed optimistically for every candidate seed; band-doubling retries
     resolved from the first round's max_off exactly like the scalar loop.
  5. host:   exact finalization (dedup/primary/mapQ/SAM or PE pairing),
     consuming cached device extension results; any cache miss falls back to
     the scalar kernel (bit-exactness is never at risk).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from mpibwa_tpu.core import opts as O
from mpibwa_tpu.core import region as R
from mpibwa_tpu.core.chain import mem_chain, mem_chain_flt, mem_flt_chained_seeds
from mpibwa_tpu.core.extend import ksw_extend2
from mpibwa_tpu.core.fm import FMIndex
from mpibwa_tpu.core.pipeline import BSeq, mem_align1_core
from mpibwa_tpu.core.refseq import RefSeq
from mpibwa_tpu.core.region import (MAX_BAND_TRY, cal_max_gap,
                                    mem_mark_primary_se, mem_reorder_primary5,
                                    mem_sort_dedup_patch)
from mpibwa_tpu.core.sam import mem_reg2sam


def _round_up(x: int, buckets) -> int:
    for b in buckets:
        if x <= b:
            return b
    return buckets[-1]


class _ExtCache:
    """Serves precomputed ksw_extend2 results; falls back to scalar."""

    def __init__(self, opt):
        self.opt = opt
        self.cache: Dict[tuple, tuple] = {}
        self.misses = 0
        self.hits = 0

    def key(self, qs, ts, w, eb, zd, h0):
        return (qs.tobytes(), ts.tobytes(), w, eb, zd, h0)

    def __call__(self, qs, ts, w, eb, zd, h0):
        k = self.key(qs, ts, w, eb, zd, h0)
        r = self.cache.get(k)
        if r is not None:
            self.hits += 1
            return r
        self.misses += 1
        opt = self.opt
        return ksw_extend2(qs, ts, opt.mat, opt.o_del, opt.e_del, opt.o_ins,
                           opt.e_ins, w, eb, zd, h0)


class DeviceAligner:
    """mem_process_seqs with the hot loops on device."""

    Q_BUCKETS = (64, 128, 192, 256, 512)
    T_BUCKETS = (128, 256, 384, 512, 768, 1024)
    MAX_SEEDS_PER_CHAIN = 8  # optimistic extension cap; rest -> scalar

    def __init__(self, idx, opt, device=None):
        from mpibwa_tpu.ops.fmd import DeviceFMIndex
        from mpibwa_tpu.pipeline.device_seed import DeviceSeeder

        self.opt = opt
        self.fm = FMIndex.from_index(idx)
        self.refs = RefSeq(idx)
        self.dfm = DeviceFMIndex(idx, device)
        self.seeder = DeviceSeeder(self.dfm, opt)
        self.stats = {"fallback_reads": 0, "ext_problems": 0, "ext_misses": 0}

    # -- phase 2: SA resolution ---------------------------------------------

    def _resolve_sa(self, mems_per_read) -> List[Dict[int, int]]:
        import jax.numpy as jnp

        opt = self.opt
        ks: List[int] = []
        owners: List[int] = []
        for b, mem in enumerate(mems_per_read):
            if mem is None:
                continue
            for iv in mem:
                step = iv[2] // opt.max_occ if iv[2] > opt.max_occ else 1
                k, count = 0, 0
                while k < iv[2] and count < opt.max_occ:
                    ks.append(iv[0] + k)
                    owners.append(b)
                    k += step
                    count += 1
        caches: List[Dict[int, int]] = [dict() for _ in mems_per_read]
        if not ks:
            return caches
        n = len(ks)
        cap = 1 << max(8, (n - 1).bit_length())
        arr = np.zeros(cap, dtype=np.int64)
        arr[:n] = ks
        got = np.asarray(self.dfm.sa_lookup_jit(jnp.asarray(arr)))[:n]
        for b, k, pos in zip(owners, ks, got):
            caches[b][k] = int(pos)
        return caches

    # -- phase 4: optimistic batched extension ------------------------------

    def _ext_batch_run(self, probs):
        """probs: list of (qs, ts, w, eb, zd, h0). Returns list of 6-tuples."""
        import jax.numpy as jnp

        from mpibwa_tpu.ops.extend_batch import extend_batch

        if not probs:
            return []
        opt = self.opt
        Q = _round_up(max(len(p[0]) for p in probs), self.Q_BUCKETS)
        T = _round_up(max(len(p[1]) for p in probs), self.T_BUCKETS)
        B = len(probs)
        Bp = 1 << max(4, (B - 1).bit_length())
        qs = np.full((Bp, Q), 4, np.uint8)
        ts = np.full((Bp, T), 4, np.uint8)
        qlens = np.ones(Bp, np.int32)
        tlens = np.zeros(Bp, np.int32)
        params = np.zeros((Bp, 4), np.int32)
        params[:, 3] = 1  # dummy h0 must be > 0
        for i, (q, t, w, eb, zd, h0) in enumerate(probs):
            if len(q) > Q or len(t) > T:
                return None  # caller splits / falls back
            qs[i, : len(q)] = q
            ts[i, : len(t)] = t
            qlens[i] = len(q)
            tlens[i] = len(t)
            params[i] = (w, eb, zd, h0)
        out = extend_batch(jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens),
                           jnp.asarray(tlens), jnp.asarray(params),
                           jnp.asarray(opt.mat.reshape(5, 5).astype(np.int32)),
                           opt.o_del, opt.e_del, opt.o_ins, opt.e_ins)
        res = np.stack([np.asarray(x) for x in out], axis=1)
        return [tuple(int(v) for v in res[i]) for i in range(B)]

    def _precompute_extensions(self, chains_per_read, qs_per_read, cache: _ExtCache):
        opt = self.opt
        refs = self.refs
        # stage 1: gather all left problems (band try 0) + chain prep
        left_jobs = []  # (key_info, qs, ts)
        chain_ctx = []  # per (read, chain): (rseq, rmax0, seeds_subset, query)
        for b, chains in enumerate(chains_per_read):
            if chains is None:
                continue
            query = qs_per_read[b]
            l_query = len(query)
            for c in chains:
                if c.n == 0:
                    continue
                l_pac = refs.l_pac
                rmax0, rmax1 = l_pac << 1, 0
                for t in c.seeds:
                    lo = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg))
                    hi = (t.rbeg + t.len + (l_query - t.qbeg - t.len)
                          + cal_max_gap(opt, l_query - t.qbeg - t.len))
                    rmax0 = min(rmax0, lo)
                    rmax1 = max(rmax1, hi)
                rmax0 = max(rmax0, 0)
                rmax1 = min(rmax1, l_pac << 1)
                if rmax0 < l_pac < rmax1:
                    if c.seeds[0].rbeg < l_pac:
                        rmax1 = l_pac
                    else:
                        rmax0 = l_pac
                rseq, rid, rmax0, rmax1 = refs.fetch_seq(rmax0, c.seeds[0].rbeg,
                                                         rmax1)
                # seeds in srt (score, idx) descending consumption order
                order = sorted(range(c.n),
                               key=lambda i: (c.seeds[i].score, i), reverse=True)
                subset = order[: self.MAX_SEEDS_PER_CHAIN]
                chain_ctx.append((b, query, rseq, rmax0, c, subset))
                for si in subset:
                    s = c.seeds[si]
                    if s.qbeg:
                        qrev = np.ascontiguousarray(query[s.qbeg - 1 :: -1])
                        tmp = s.rbeg - rmax0
                        trev = np.ascontiguousarray(
                            rseq[tmp - 1 :: -1] if tmp > 0 else rseq[:0])
                        left_jobs.append((qrev, trev, s.len * opt.a))

        def run_band_tries(jobs, eb):
            """jobs: list of (qs, ts, h0); exact MAX_BAND_TRY semantics."""
            results = {}
            probs0 = [(q, t, opt.w, eb, opt.zdrop, h0) for q, t, h0 in jobs]
            r0 = self._ext_batch_run(probs0)
            if r0 is None:
                return None
            retry_idx = []
            for i, r in enumerate(r0):
                aw0 = opt.w
                # break unless max_off >= (aw>>1)+(aw>>2) (score==prev
                # impossible on the first try: prev==-1)
                if not (r[5] < (aw0 >> 1) + (aw0 >> 2)):
                    retry_idx.append(i)
            r1map = {}
            if retry_idx:
                probs1 = [(jobs[i][0], jobs[i][1], opt.w << 1, eb, opt.zdrop,
                           jobs[i][2]) for i in retry_idx]
                r1 = self._ext_batch_run(probs1)
                if r1 is None:
                    return None
                r1map = dict(zip(retry_idx, r1))
            return r0, r1map

        lr = run_band_tries(left_jobs, opt.pen_clip5)
        if lr is None:
            return  # oversize problems: everything falls back to scalar
        left_r0, left_r1 = lr
        # fill cache with left results, compute sc0 per seed, gather rights
        li = 0
        right_jobs = []
        for (b, query, rseq, rmax0, c, subset) in chain_ctx:
            l_query = len(query)
            for si in subset:
                s = c.seeds[si]
                sc0 = s.len * opt.a
                if s.qbeg:
                    qrev = np.ascontiguousarray(query[s.qbeg - 1 :: -1])
                    tmp = s.rbeg - rmax0
                    trev = np.ascontiguousarray(
                        rseq[tmp - 1 :: -1] if tmp > 0 else rseq[:0])
                    h0 = s.len * opt.a
                    r0 = left_r0[li]
                    cache.cache[cache.key(qrev, trev, opt.w, opt.pen_clip5,
                                          opt.zdrop, h0)] = r0
                    score = r0[0]
                    if li in left_r1:
                        r1 = left_r1[li]
                        cache.cache[cache.key(qrev, trev, opt.w << 1,
                                              opt.pen_clip5, opt.zdrop, h0)] = r1
                        score = r1[0]
                    # replicate selection to know sc0 for the right problem
                    # (exactly the MAX_BAND_TRY loop's final a.score)
                    sc0 = score
                    li += 1
                if s.qbeg + s.len != l_query:
                    qe = s.qbeg + s.len
                    re = s.rbeg + s.len - rmax0
                    right_jobs.append((np.ascontiguousarray(query[qe:]),
                                       np.ascontiguousarray(rseq[re:]), sc0))
        rr = run_band_tries(right_jobs, opt.pen_clip3)
        if rr is None:
            return
        right_r0, right_r1 = rr
        for i, (q, t, h0) in enumerate(right_jobs):
            cache.cache[cache.key(q, t, opt.w, opt.pen_clip3, opt.zdrop, h0)] = \
                right_r0[i]
            if i in right_r1:
                cache.cache[cache.key(q, t, opt.w << 1, opt.pen_clip3,
                                      opt.zdrop, h0)] = right_r1[i]
        self.stats["ext_problems"] += len(left_jobs) + len(right_jobs)

    # -- the public entry ----------------------------------------------------

    def align_regs(self, seqs: List[BSeq]) -> List[List[R.AlnReg]]:
        """Compute alignment regions for a batch (device hot loops)."""
        import time as _time

        t = self.stats.setdefault("t", {})
        opt, fm, refs = self.opt, self.fm, self.refs
        t0 = _time.time()
        mems, fallback = self.seeder.collect_batch([s.seq for s in seqs])
        t["seed"] = t.get("seed", 0) + _time.time() - t0
        self.stats["fallback_reads"] += int(fallback.sum())
        t0 = _time.time()
        sa_caches = self._resolve_sa(mems)
        t["sa"] = t.get("sa", 0) + _time.time() - t0
        t0 = _time.time()
        # host chains
        chains_per_read = []
        for b, s in enumerate(seqs):
            if mems[b] is None:
                chains_per_read.append(None)
                continue
            chn = mem_chain(opt, fm, refs, s.seq, s.l_seq, mem=mems[b],
                            sa=lambda k: sa_caches[b][k])
            chn = mem_chain_flt(opt, chn)
            mem_flt_chained_seeds(opt, refs, s.l_seq, s.seq, chn)
            chains_per_read.append(chn)
        t["chain"] = t.get("chain", 0) + _time.time() - t0
        t0 = _time.time()
        cache = _ExtCache(opt)
        self._precompute_extensions(chains_per_read,
                                    [s.seq for s in seqs], cache)
        t["ext"] = t.get("ext", 0) + _time.time() - t0
        t0 = _time.time()
        # finalization per read
        regs_all = []
        for b, s in enumerate(seqs):
            if chains_per_read[b] is None:
                regs = mem_align1_core(opt, fm, refs, s.seq)
            else:
                regs: List[R.AlnReg] = []
                for c in chains_per_read[b]:
                    R.mem_chain2aln(opt, refs, s.l_seq, s.seq, c, regs,
                                    extender=cache)
                regs = mem_sort_dedup_patch(opt, refs, s.seq, regs)
                for p in regs:
                    if p.rid >= 0 and refs.anns[p.rid].is_alt:
                        p.is_alt = 1
            regs_all.append(regs)
        t["final"] = t.get("final", 0) + _time.time() - t0
        self.stats["ext_misses"] += cache.misses
        return regs_all

    def process_seqs(self, seqs: List[BSeq], n_processed: int = 0,
                     pes0=None, rg_id: str = "") -> None:
        opt, refs = self.opt, self.refs
        regs_all = self.align_regs(seqs)
        n = len(seqs)
        if opt.flag & O.MEM_F_PE:
            from mpibwa_tpu.core.pair import mem_pestat, mem_sam_pe

            pes = pes0 if pes0 is not None else mem_pestat(opt, refs.l_pac,
                                                           regs_all)
            for i in range(n >> 1):
                mem_sam_pe(opt, refs, pes, (n_processed >> 1) + i,
                           seqs[i << 1 : (i << 1) + 2],
                           regs_all[i << 1 : (i << 1) + 2], rg_id)
        else:
            for i, s in enumerate(seqs):
                regs = regs_all[i]
                mem_mark_primary_se(opt, regs, n_processed + i)
                if opt.flag & O.MEM_F_PRIMARY5:
                    mem_reorder_primary5(opt.T, regs)
                s.sam = mem_reg2sam(opt, refs, s, regs, 0, None, rg_id)
