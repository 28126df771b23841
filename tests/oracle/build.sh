#!/bin/bash
# Build the oracle driver against the (read-only) reference engine sources.
# Everything is compiled OUT OF TREE in /tmp; no reference code enters the repo.
set -euo pipefail
REF=${REF:-/root/reference/src}
OUT=${OUT:-/tmp/oracle_build}
mkdir -p "$OUT"
# stub mpi.h: fixmate.h includes it but uses no MPI symbols
mkdir -p "$OUT/stubinc"
cat > "$OUT/stubinc/mpi.h" <<'MPIEOF'
#ifndef STUB_MPI_H
#define STUB_MPI_H
typedef int MPI_Comm; typedef int MPI_File; typedef int MPI_Status;
#endif
MPIEOF
SRCS="utils.c kthread.c kstring.c ksw.c bwt.c bntseq.c bwa.c bwamem.c bwamem_pair.c bwamem_extra.c malloc_wrap.c fixmate.c"
objs=()
for s in $SRCS; do
  o="$OUT/${s%.c}.o"
  if [ ! -f "$o" ] || [ "$REF/$s" -nt "$o" ]; then
    gcc -c -g -Wall -Wno-unused-function -O2 -DHAVE_PTHREAD -DUSE_MALLOC_WRAPPERS \
        -I"$OUT/stubinc" -I"$REF" -o "$o" "$REF/$s"
  fi
  objs+=("$o")
done
gcc -g -O2 -DHAVE_PTHREAD -I"$OUT/stubinc" -I"$REF" \
    -o "$OUT/oracle" "$(dirname "$0")/oracle_main.c" "${objs[@]}" -lm -lz -lpthread
echo "$OUT/oracle"
