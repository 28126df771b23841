"""Streaming alignment runtime: the mpiBWA main-loop equivalent.

Per-phase wall-clock timing is logged to stderr like the reference's
per-rank "rank N :::" lines (mainParallel.c:786-790, 1238-1317, aggregate
stats :3266-3291); gate with verbose=False.

Replaces the reference's MPI architecture with the TPU-native layout
(SURVEY §7): deterministic base-count chunks, round-robin chunk->shard
assignment, per-shard device pipeline, and a deterministic chunk-order
merge through an async writer thread (the analog of write_sam_mt,
mainParallel.c:129-199 — but with guaranteed output order).
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time
from typing import List, Optional

import numpy as np

from mpibwa_tpu.core import opts as O
from mpibwa_tpu.io import bgzf as bgzf_mod
from mpibwa_tpu.io import headers as hdr_mod
from mpibwa_tpu.io.fastq import interleave, read_fastq
from mpibwa_tpu.io.fixmate import apply_fixmate
from mpibwa_tpu.parallel.chunker import chunk_pe, chunk_se

SAM, BAM, BGZF = 2, 1, 0  # write_format codes (mainParallel.c:225)


class _OrderedWriter:
    """Async writer draining (chunk_idx, payload) in chunk order."""

    def __init__(self, sink):
        self.sink = sink  # callable(bytes)
        self.q: "queue.Queue" = queue.Queue(maxsize=8)
        self.pending = {}
        self.next_idx = 0
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                break
            idx, payload = item
            self.pending[idx] = payload
            while self.next_idx in self.pending:
                self.sink(self.pending.pop(self.next_idx))
                self.next_idx += 1

    def put(self, idx: int, payload):
        self.q.put((idx, payload))

    def close(self):
        self.q.put(None)
        self.thread.join()
        assert not self.pending, "writer finished with gaps"


class Runtime:
    """Single-host streaming runtime (multi-shard aware via shard/n_shards)."""

    def __init__(self, idx, opt, use_device: bool = True,
                 fixed_chunk_size: Optional[int] = None,
                 shard: int = 0, n_shards: int = 1, verbose: bool = True,
                 devices=None):
        """devices: list of jax devices for intra-host data parallelism —
        each device gets its own aligner (index replica in its HBM) and
        chunks are fanned out round-robin, the mesh analog of mpiBWA's
        rank-per-chunk scatter. Default: single (default) device."""
        self.idx = idx
        self.opt = opt
        self.verbose = verbose
        self.times = {"parse": 0.0, "align": 0.0, "fixmate": 0.0,
                      "write_enqueue": 0.0}
        self.fixed_chunk_size = (fixed_chunk_size
                                 or opt.chunk_size * opt.n_threads)
        self.shard = shard
        self.n_shards = n_shards
        self.devices = devices
        if use_device and devices and len(devices) > 1:
            # devices may repeat: several workers on one chip overlap that
            # chip's host finalization with its device compute; they share
            # one HBM index replica per distinct device
            from mpibwa_tpu.ops.fmd import DeviceFMIndex
            from mpibwa_tpu.pipeline.device_align import DeviceAligner

            dfms = {}
            for d in devices:
                if id(d) not in dfms:
                    dfms[id(d)] = DeviceFMIndex(idx, d)
            self.aligners = [DeviceAligner(idx, opt, dfm=dfms[id(d)])
                             for d in devices]
            self._process = self.aligners[0].process_seqs
        elif use_device:
            from mpibwa_tpu.pipeline.device_align import DeviceAligner

            self.aligner = DeviceAligner(idx, opt)
            self._process = self.aligner.process_seqs
        else:
            from mpibwa_tpu.core.fm import FMIndex
            from mpibwa_tpu.core.pipeline import process_seqs
            from mpibwa_tpu.core.refseq import RefSeq

            fm = FMIndex.from_index(idx)
            refs = RefSeq(idx)
            self._process = lambda seqs, n_processed=0, pes0=None, rg_id="": \
                process_seqs(opt, fm, refs, seqs, n_processed, pes0, rg_id)

    # -- chunk planning ------------------------------------------------------

    def plan(self, r1_path: str, r2_path: Optional[str], copy_comment=False):
        """Read inputs, decide branch (untrimmed PE / trimmed PE / SE), and
        compute deterministic chunks (mainParallel.c's three branches)."""
        reads1 = read_fastq(r1_path, copy_comment)
        if r2_path:
            reads2 = read_fastq(r2_path, copy_comment)
            # branch selection by file size equality (mainParallel.c:730)
            untrimmed = os.path.getsize(r1_path) == os.path.getsize(r2_path)
            sizes1 = np.array([r.l_seq for r in reads1], np.int64)
            sizes2 = np.array([r.l_seq for r in reads2], np.int64)
            chunks = chunk_pe(sizes1, sizes2, self.fixed_chunk_size, not untrimmed)
            seqs = interleave(reads1, reads2)
            return seqs, chunks, True, untrimmed
        if self.opt.flag & O.MEM_F_SMARTPE:
            # smart pairing (-p): one interleaved file, consecutive reads are
            # mates (mainParallel.c:306 sets the flag; the engine pairs
            # 2i/2i+1). Chunks are whole pairs so pairing never splits.
            if len(reads1) % 2:
                raise ValueError("smart pairing (-p) needs an even number "
                                 f"of reads, got {len(reads1)}")
            sizes1 = np.array([r.l_seq for r in reads1[0::2]], np.int64)
            sizes2 = np.array([r.l_seq for r in reads1[1::2]], np.int64)
            chunks = chunk_pe(sizes1, sizes2, self.fixed_chunk_size, True)
            return reads1, chunks, True, False
        sizes = np.array([r.l_seq for r in reads1], np.int64)
        chunks = chunk_se(sizes, self.fixed_chunk_size)
        return reads1, chunks, False, False

    # -- the main loop -------------------------------------------------------

    def run(self, r1_path: str, r2_path: Optional[str], out_path: str,
            write_format: int = SAM, dofixmate: bool = False,
            hdr_line=None, rg_line=None, pg_line=None, rg_id: str = "",
            copy_comment: bool = False, pes0=None, compression_level: int = 3):
        opt = self.opt
        seqs, chunks, is_pe, untrimmed = self.plan(r1_path, r2_path,
                                                   copy_comment)
        if is_pe:
            opt.flag |= O.MEM_F_PE

        ext = {SAM: ".sam", BAM: ".bam", BGZF: ".gz"}[write_format]
        path = out_path + ext
        f = open(path, "wb")
        header = hdr_mod.sam_header(self.idx.anns, hdr_line, rg_line, pg_line)
        self.header_len = len(header)
        if self.shard != 0:
            header = ""  # only shard 0 carries the header (merge prepends it)
        if write_format == SAM:
            if header:
                f.write(header.encode())
            sink = f.write
        else:
            # BAM mode here is BGZF-of-SAM-text like the reference
            # (mainParallel.c:1509-1516, SURVEY §1-L3)
            w = bgzf_mod.BGZFWriter(f, compression_level)
            w.write_record(header.encode())
            w.flush_block()
            sink = w.write_record

        writer = _OrderedWriter(sink)
        manifest = []  # (chunk_idx, n_bytes) for this shard, in chunk order
        if self.devices and len(self.devices) > 1:
            return self._run_multidevice(seqs, chunks, is_pe, untrimmed,
                                         writer, manifest, dofixmate, pes0,
                                         rg_id, write_format, f,
                                         locals().get("w"), path)
        n_processed = 0
        next_local = [0]
        t_start = time.time()
        for ci, ch in enumerate(chunks):
            mult = 2 if is_pe else 1
            lo = ch.start * mult
            hi = (ch.start + ch.count) * mult
            if ci % self.n_shards != self.shard:
                n_processed += hi - lo
                continue
            batch = seqs[lo:hi]
            # untrimmed PE passes n_processed = 0 per chunk
            # (mainParallel.c:1314); trimmed/SE accumulate (:2355-2357)
            np_arg = 0 if (is_pe and untrimmed) else n_processed
            t0 = time.time()
            self._process(batch, n_processed=np_arg, pes0=pes0, rg_id=rg_id)
            self.times["align"] += time.time() - t0
            if self.verbose:
                print(f"shard {self.shard} ::: chunk {ci}: aligned "
                      f"{len(batch)} reads ({time.time() - t0:.2f}s)",
                      file=sys.stderr)
            t0 = time.time()
            if dofixmate and is_pe:
                apply_fixmate(batch, self.idx.anns)
            self.times["fixmate"] += time.time() - t0
            text = "".join(s.sam for s in batch).encode()
            for s in batch:
                s.sam = None  # free
            manifest.append((ci, len(text)))
            writer.put(next_local[0], text)  # local order = chunk order
            next_local[0] += 1
            n_processed += hi - lo
        writer.close()
        self.last_manifest = manifest
        if self.verbose:
            tot = time.time() - t_start
            n_my = sum(1 for ci in range(len(chunks))
                       if ci % self.n_shards == self.shard)
            print(f"shard {self.shard} ::: processed {n_processed} reads, "
                  f"{n_my}/{len(chunks)} chunks in {tot:.1f}s "
                  f"(align {self.times['align']:.1f}s, "
                  f"fixmate {self.times['fixmate']:.1f}s)", file=sys.stderr)
        if write_format == SAM:
            f.close()
        else:
            w.close(write_eof=True)
            f.close()
        return path

    # -- by-chromosome output (mpiBWAByChr equivalent) -----------------------

    def run_by_chr(self, r1_path: str, r2_path: Optional[str], out_dir: str,
                   write_format: int = SAM, dofixmate: bool = False,
                   hdr_line=None, rg_line=None, pg_line=None, rg_id: str = "",
                   copy_comment: bool = False, pes0=None,
                   compression_level: int = 3):
        """One output per contig + discordant/unmapped (SURVEY §1-L5)."""
        from mpibwa_tpu.io.bychr import ByChrRouter

        opt = self.opt
        seqs, chunks, is_pe, untrimmed = self.plan(r1_path, r2_path,
                                                   copy_comment)
        if is_pe:
            opt.flag |= O.MEM_F_PE
        router = ByChrRouter(self.idx.anns, dofixmate)
        os.makedirs(out_dir, exist_ok=True)
        ext = {SAM: ".sam", BAM: ".bam", BGZF: ".gz"}[write_format]
        header = hdr_mod.sam_header(self.idx.anns, hdr_line, rg_line, pg_line)
        sinks = []
        for name in router.files:
            f = open(os.path.join(out_dir, name + ext), "wb")
            if write_format == SAM:
                f.write(header.encode())
                sinks.append((f, None))
            else:
                w = bgzf_mod.BGZFWriter(f, compression_level)
                w.write_record(header.encode())
                w.flush_block()
                sinks.append((f, w))
        n_processed = 0
        for ci, ch in enumerate(chunks):
            mult = 2 if is_pe else 1
            lo, hi = ch.start * mult, (ch.start + ch.count) * mult
            batch = seqs[lo:hi]
            np_arg = 0 if (is_pe and untrimmed) else n_processed
            self._process(batch, n_processed=np_arg, pes0=pes0, rg_id=rg_id)
            if dofixmate and is_pe:
                apply_fixmate(batch, self.idx.anns)
            routed = router.route_text("".join(s.sam for s in batch))
            for s in batch:
                s.sam = None
            for idx_f, lines in routed.items():
                f, w = sinks[idx_f]
                data = "".join(lines).encode()
                if w is None:
                    f.write(data)
                else:
                    for line in lines:
                        w.write_record(line.encode())
            n_processed += hi - lo
        paths = []
        for (f, w), name in zip(sinks, router.files):
            if w is not None:
                w.close(write_eof=True)  # per-file EOF magic (:1591-1599)
            f.close()
            paths.append(os.path.join(out_dir, name + ext))
        return paths

    def _run_multidevice(self, seqs, chunks, is_pe, untrimmed, writer,
                         manifest, dofixmate, pes0, rg_id, write_format,
                         f, w, path):
        """Fan chunks out to per-device aligner threads; the ordered writer
        reassembles output deterministically in chunk order."""
        import concurrent.futures

        mult = 2 if is_pe else 1
        # n_processed prefix per chunk (trimmed/SE accumulate)
        prefix = []
        acc = 0
        for ch in chunks:
            prefix.append(acc)
            acc += ch.count * mult

        lock = threading.Lock()
        local_idx = {}
        order = [ci for ci in range(len(chunks))
                 if ci % self.n_shards == self.shard]
        for k, ci in enumerate(order):
            local_idx[ci] = k
        man = {}
        nw = len(self.aligners)

        def run_device(wi):
            # one thread per device; an aligner is stateful, so all of a
            # device's chunks run serially on its own thread (JAX dispatch
            # releases the GIL, so device compute overlaps across threads)
            al = self.aligners[wi]
            for k in range(wi, len(order), nw):
                ci = order[k]
                ch = chunks[ci]
                lo, hi = ch.start * mult, (ch.start + ch.count) * mult
                batch = seqs[lo:hi]
                np_arg = 0 if (is_pe and untrimmed) else prefix[ci]
                al.process_seqs(batch, n_processed=np_arg, pes0=pes0,
                                rg_id=rg_id)
                if dofixmate and is_pe:
                    apply_fixmate(batch, self.idx.anns)
                text = "".join(s.sam for s in batch).encode()
                for s in batch:
                    s.sam = None
                with lock:
                    man[ci] = len(text)
                    writer.put(local_idx[ci], text)

        with concurrent.futures.ThreadPoolExecutor(max_workers=nw) as ex:
            futs = [ex.submit(run_device, wi) for wi in range(nw)]
            for fu in futs:
                fu.result()
        writer.close()
        manifest.extend((ci, man[ci]) for ci in order)
        self.last_manifest = manifest
        if write_format == SAM:
            f.close()
        else:
            w.close(write_eof=True)
            f.close()
        return path


def merge_shard_outputs(shard_paths, manifests, out_path, header_len: int):
    """Deterministic chunk-order merge of per-shard SAM outputs.

    shard_paths[k] was written by Runtime(shard=k, n_shards=K): shard 0's
    file starts with the header; each shard then holds its chunks in chunk
    order with byte sizes recorded in manifests[k]."""
    entries = []  # (chunk_idx, shard, offset, nbytes)
    for k, man in enumerate(manifests):
        off = header_len if k == 0 else 0
        for ci, nb in man:
            entries.append((ci, k, off, nb))
            off += nb
    entries.sort()
    files = [open(p, "rb") for p in shard_paths]
    with open(out_path, "wb") as out:
        head = files[0].read(header_len)
        out.write(head)
        for ci, k, off, nb in entries:
            files[k].seek(off)
            out.write(files[k].read(nb))
    for f in files:
        f.close()
    return out_path
