#!/usr/bin/env bash
# Cluster submission for the flagship KG build (north-rule "run via
# ray job submit on a fixed-size multi-node Ray cluster").
#
# The CLI (kg_covid_19_ray/cli.py) is already job-shaped: it calls
# ray.init(address=...) lazily (connecting to the cluster the job
# runner placed it on), streams everything, writes partitioned parquet,
# and exits 0/1 — so submission is one command per stage.
#
# Usage (against a running cluster; RAY_ADDRESS or --address selects it):
#   ./scripts/submit_job.sh <pages_parquet_dir> <output_dir> [checkpoint_dir]
#
# In this sandbox there is no multi-node cluster; the same commands run
# against a local `ray start --head` session, which is how the script
# is smoke-tested (tests/test_merge_registry CLI tests via the module entry point).
set -euo pipefail

INPUT=${1:?pages parquet dir}
OUTPUT=${2:?output dir}
CHECKPOINT=${3:-$OUTPUT/checkpoints}

# Submissions BLOCK until each job finishes (no --no-wait): the merge
# reads the transform outputs, and its --sources glob below expands at
# submit time — both require stage 1 to be complete first.
SUBMIT=(ray job submit
  --working-dir "$(cd "$(dirname "$0")/.." && pwd)")

# Stage 1: per-source transforms. Resumable: a resubmitted job skips
# every stage whose checkpoint manifest matches (state/checkpoint.py).
"${SUBMIT[@]}" -- python -m kg_covid_19_ray.cli transform \
  --input "$INPUT" \
  --output-dir "$OUTPUT/transforms" \
  --checkpoint-dir "$CHECKPOINT" \
  --tsv

# Stage 2: config-driven merge of the per-source outputs into the
# merged node/edge tables (+ KGX TSV + N-Triples + tar.gz exports).
"${SUBMIT[@]}" -- python -m kg_covid_19_ray.cli merge \
  --sources "$OUTPUT/transforms"/* \
  --output-dir "$OUTPUT/merged" \
  --stats --tsv --nt --tar
