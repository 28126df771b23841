#!/bin/bash
# Paired-end alignment of the bundled 10K-read test data (the equivalent of
# the reference's examples/standard.sh mpirun invocation).
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
python -m mpibwa_tpu.cli mem -t 8 \
    -o "$WORK/HCC1187C" \
    "$WORK/hg19.small.fa" \
    "$DATA/HCC1187C_R1_10K.fastq" \
    "$DATA/HCC1187C_R2_10K.fastq"
echo "output: $WORK/HCC1187C.sam"
