#!/bin/bash
# Index construction from FASTA (the reference's examples/genome.sh:
# bwa index + mpiBWAIdx). Our builder reproduces bwa's artifacts
# byte-identically and then packs the flat TPU image.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(dirname "$HERE")
DATA=${DATA:-/root/reference/examples/data}
WORK=${WORK:-/tmp/mpibwa_tpu_example}

mkdir -p "$WORK"
tar xzf "$DATA/hg19.small.tar.gz" -C "$WORK" hg19.small.fa

cd "$REPO"
python -m mpibwa_tpu.cli index "$WORK/hg19.small.fa"   # .bwt/.sa/.ann/.amb/.pac
python -m mpibwa_tpu.cli idx "$WORK/hg19.small.fa"     # .tpumap flat image
ls -la "$WORK"
