#!/bin/bash
# Multi-process scaling (the `mpirun -n N mpiBWA` analog): one process per
# shard, then a deterministic chunk-order merge. Output is byte-identical
# to the single-process run for any shard count. On a multi-host TPU pod,
# run one shard per host; within a host, MPIBWA_DEVICES=all fans chunks
# over the local chips.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(dirname "$HERE")
DATA=${DATA:-/root/reference/examples/data}
WORK=${WORK:-/tmp/mpibwa_tpu_example}
N=${N:-2}

mkdir -p "$WORK"
if [ ! -f "$WORK/hg19.small.fa" ]; then
    tar xzf "$DATA/hg19.small.tar.gz" -C "$WORK"
fi

cd "$REPO"
pids=()
for i in $(seq 0 $((N - 1))); do
    MPIBWA_SHARD=$i MPIBWA_NSHARDS=$N \
        python -m mpibwa_tpu.cli mem \
        -o "$WORK/shard$i" \
        "$WORK/hg19.small.fa" \
        "$DATA/HCC1187C_R1_10K.fastq" &
    pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done

shards=()
for i in $(seq 0 $((N - 1))); do shards+=("$WORK/shard$i.sam"); done
python -m mpibwa_tpu.cli merge "$WORK/merged.sam" "${shards[@]}"
echo "output: $WORK/merged.sam"
