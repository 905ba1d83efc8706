#!/usr/bin/env bash
# Multi-host TPU evaluation launcher (reference tools/scripts/dist_test.sh
# equivalent): per-host eval sharding with an allgather result merge
# (tools/test.py) replaces the reference's pickle-file merge + barriers.
#
# Usage: tools/scripts/tpu_test.sh <cfg_file> [extra test.py args...]
set -euo pipefail

CFG=${1:?usage: tpu_test.sh <cfg_file> [args...]}
shift

exec python "$(dirname "$0")/../test.py" --cfg_file "$CFG" "$@"
