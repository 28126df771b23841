"""Genome-scale index construction + device-path identity vs the oracle.

Builds a 20 Mbp synthetic genome with our own toolchain (SA-IS suffix
array, native/sais.c), aligns sampled reads through the device pipeline,
and byte-compares the SAM body against the reference engine compiled out
of tree (tests/oracle). This is the scaled-down version of the 250 Mbp
validation run (see DESIGN.md round-2 notes: 883 reads/s/chip int32,
559 reads/s/chip forced-int64, both byte-identical on 10K reads)."""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ORACLE = "/tmp/oracle_build/oracle"


@pytest.fixture(scope="module")
def big_prefix(tmp_path_factory):
    from mpibwa_tpu.index.build import build_index
    from mpibwa_tpu.native import sais_u8

    if sais_u8(np.zeros(8, np.uint8)) is None:
        pytest.skip("native sais unavailable")
    td = tmp_path_factory.mktemp("genome20m")
    fa = str(td / "g20.fa")
    rng = np.random.default_rng(11)
    n = 20_000_000
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), n,
                       p=[0.3, 0.2, 0.2, 0.3])
    for _ in range(5):
        p = int(rng.integers(0, n - 500))
        bases[p : p + int(rng.integers(30, 400))] = ord("N")
    with open(fa, "w") as f:
        f.write(">c1 synthetic20m\n")
        txt = bases.tobytes().decode()
        for off in range(0, n, 80):
            f.write(txt[off : off + 80])
            f.write("\n")
    build_index(fa)
    return fa


def test_genome20m_identity_vs_oracle(big_prefix, tmp_path):
    from mpibwa_tpu.core.opts import mem_opt_init
    from mpibwa_tpu.index.format import load_index, unpack_pac
    from mpibwa_tpu.io.fastq import read_fastq
    from mpibwa_tpu.pipeline.device_align import DeviceAligner

    if not os.path.exists(ORACLE):
        r = subprocess.run(["bash", "tests/oracle/build.sh"],
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))),
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("oracle build failed")

    idx = load_index(big_prefix)
    rng = np.random.default_rng(5)
    fwd = unpack_pac(idx.pac, idx.l_pac)
    fq = str(tmp_path / "reads.fastq")
    with open(fq, "w") as f:
        k = 0
        while k < 500:
            p = int(rng.integers(0, idx.l_pac - 101))
            r = fwd[p : p + 101].copy()
            if (r > 3).any():
                continue
            errs = rng.random(101) < 0.01
            r[errs] = (r[errs] + rng.integers(1, 4)) % 4
            if rng.random() < 0.5:
                r = 3 - r[::-1]
            f.write(f"@r{k}\n{''.join('ACGT'[b] for b in r)}\n+\n{'I'*101}\n")
            k += 1
    want = subprocess.run([ORACLE, "mem", big_prefix, fq],
                          capture_output=True, text=True, check=True).stdout

    al = DeviceAligner(idx, mem_opt_init())
    reads = read_fastq(fq)
    al.process_seqs(reads, 0)
    got = "".join(s.sam for s in reads)
    assert got == want
