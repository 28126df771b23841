"""Benchmark: reads aligned/sec/chip on the bundled example data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: mpiBWA 1 rank x 1 thread = 40224 reads / 25.84 s = 1556.7 reads/s
(/root/reference/docs/README.md:216-218).

Output is verified byte-identical to the golden (reference engine) SAM as
part of the run — a benchmark number only counts if the output is right.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_READS_PER_SEC = 40224 / 25.84  # mpiBWA -n 1 -t 1

DATA = "/root/reference/examples/data"
IDX_TGZ = f"{DATA}/hg19.small.tar.gz"
IDX_DIR = "/tmp/ref"
IDX_PREFIX = f"{IDX_DIR}/hg19.small.fa"


def ensure_index():
    if not os.path.exists(IDX_PREFIX + ".bwt"):
        os.makedirs(IDX_DIR, exist_ok=True)
        subprocess.run(["tar", "xzf", IDX_TGZ, "-C", IDX_DIR], check=True)


def main():
    import jax

    # persistent compile cache (helps CPU backends; axon compiles remotely)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    ensure_index()
    from mpibwa_tpu.core.opts import mem_opt_init
    from mpibwa_tpu.index.format import load_index
    from mpibwa_tpu.io.fastq import read_fastq
    from mpibwa_tpu.pipeline.device_align import DeviceAligner

    idx = load_index(IDX_PREFIX)
    opt = mem_opt_init()
    pe = os.environ.get("BENCH_PE", "0") == "1"
    if pe:
        from mpibwa_tpu.core.opts import MEM_F_PE
        from mpibwa_tpu.io.fastq import interleave

        opt.flag |= MEM_F_PE
        seqs = interleave(read_fastq(f"{DATA}/HCC1187C_R1_10K.fastq"),
                          read_fastq(f"{DATA}/HCC1187C_R2_10K.fastq"))
    else:
        seqs = read_fastq(f"{DATA}/HCC1187C_R1_10K.fastq")

    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    workers = int(os.environ.get("BENCH_WORKERS", "3"))
    from mpibwa_tpu.ops.fmd import DeviceFMIndex

    dfm = DeviceFMIndex(idx)
    als = [DeviceAligner(idx, opt, dfm=dfm) for _ in range(workers)]
    bounds = []
    if pe:
        # insert-size stats are batch-scoped (mem_pestat), so the PE golden
        # corresponds to the whole file as one batch (the device pipeline
        # microbatches internally)
        bounds.append((0, len(seqs)))
    else:
        off = 0
        while off < len(seqs):
            cnt = min(batch, len(seqs) - off)
            bounds.append((off, cnt))
            off += cnt

    import concurrent.futures

    def run_pass():
        # round-robin over pipelined workers sharing the chip (host
        # finalization of one batch overlaps device compute of another)
        def run_worker(wi):
            for bi in range(wi, len(bounds), workers):
                o, cnt = bounds[bi]
                als[wi].process_seqs(seqs[o : o + cnt], n_processed=o)

        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            for fu in [ex.submit(run_worker, wi) for wi in range(workers)]:
                fu.result()

    # warm pass: compiles every shape combination the data produces
    # (the axon backend compiles remotely and ignores the persistent cache)
    run_pass()
    # timed steady-state pass over the same batches (same n_processed ->
    # byte-identical .sam, re-verified below)
    t0 = time.time()
    run_pass()
    dt = time.time() - t0
    n_timed = sum(c for _, c in bounds)
    reads_per_sec = n_timed / dt

    # correctness gate: byte-identity vs the reference engine's output
    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden",
                          "pe_10k.sam" if pe else "se_10k.sam")
    ok = True
    if os.path.exists(golden):
        got = "".join(s.sam for s in seqs)
        ok = got == open(golden).read()

    print(json.dumps({
        "metric": "reads_aligned_per_sec_per_chip_"
                  + ("pe" if pe else "se") + ("" if ok else "_WRONG_OUTPUT"),
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
