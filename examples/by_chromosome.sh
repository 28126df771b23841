#!/bin/bash
# Per-chromosome output fan-out (the mpiBWAByChr equivalent): one file per
# contig plus discordant + unmapped, each with a full header; with -f the
# discordant file is dropped and fixmate is applied.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(dirname "$HERE")
DATA=${DATA:-/root/reference/examples/data}
WORK=${WORK:-/tmp/mpibwa_tpu_example}

mkdir -p "$WORK"
if [ ! -f "$WORK/hg19.small.fa" ]; then
    tar xzf "$DATA/hg19.small.tar.gz" -C "$WORK"
fi

cd "$REPO"
python -m mpibwa_tpu.cli membychr \
    -o "$WORK/by_chr" \
    "$WORK/hg19.small.fa" \
    "$DATA/HCC1187C_R1_10K.fastq" \
    "$DATA/HCC1187C_R2_10K.fastq"
ls -la "$WORK/by_chr"
