#!/bin/sh
# Reproduction recipe for the r15/r16 at-scale evidence (VERDICT r15 #7).
# Every tool synthesizes its corpus DETERMINISTICALLY on first use
# (same RNG, same rows -- tools/curation_stress.iter_corpus for text,
# tools/ann_attrib.ensure_embeddings for vectors), so each command is
# self-contained given a scratch dir. Run each line in its own process
# on an otherwise-idle box; JSON lands on stdout. Sizes below fit a
# ~250 GB disk with ~80 GB free; halve the corpus sizes for smaller
# boxes (the kernels' crossovers are all far below 1M).
#
#   sh tools/repro_r16.sh <scratch_dir> [quick]
#
# `quick` runs the sub-10-minute subset only.

set -e
SCRATCH="${1:?usage: repro_r16.sh <scratch_dir> [quick]}"
MODE="${2:-full}"
export SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-64g}"
cd "$(dirname "$0")/.."

echo "# --- r16 ANN kernel terms (VERDICT r15 #4) ----------------------" >&2
# each term expr-vs-kernel, noop sink, min-of-2, warm session
python tools/ann_attrib.py 1000000 "$SCRATCH/emb1m" 2

if [ "$MODE" = "full" ]; then
  echo "# --- r15 span kernel terms (1M corpus, expr vs kernel) --------" >&2
  python tools/span_attrib.py 1000000 "$SCRATCH/c1m"

  echo "# --- r15 bucket-count write A/B at 8M (32 vs 64 buckets) ------" >&2
  # input materialized once inside the tool; run each arm in its own
  # process, alternating, and compare mins (the r15 protocol)
  python tools/lexical_attrib.py --buildwrite 8000000 "$SCRATCH/c8m" terms 32
  python tools/lexical_attrib.py --buildwrite 8000000 "$SCRATCH/c8m" terms 64

  echo "# --- r16 doc_clusters per-term split at 8M (VERDICT r15 #1) ---" >&2
  # disk-backed bucketed boundaries throughout (the production shape)
  python tools/lexical_attrib.py 8000000 "$SCRATCH/c8m"

  echo "# --- r16 planted recall at 8M (VERDICT r15 #3) -----------------" >&2
  # zstd shuffle/spill; needs ~60-75 GB free scratch
  python tools/lexical_recall_plant.py 8000000 "$SCRATCH/c8m"
fi

echo "# --- driver bench (sf0.1, idle box) -----------------------------" >&2
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python bench.py
