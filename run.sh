#!/bin/bash
# Familiar entry point mirroring the reference's run.sh commands
# (reference run.sh:159-167), delegating to the Python pipeline.
#
#   ./run.sh download   — fetch + prepare the Middlebury datasets
#   ./run.sh            — sweep both algorithms over all sequences
#   ./run.sh restart    — wipe results and re-run
#   ./run.sh install    — install the package (pip editable)

set -e
cd "$(dirname "$0")"

if [ "$1" = "download" ]; then
    python3 -m ofot_tpu.cli.pipeline download "${@:2}"
elif [ "$1" = "install" ]; then
    pip install -e .
elif [ "$1" = "restart" ]; then
    python3 -m ofot_tpu.cli.pipeline restart "${@:2}"
else
    python3 -m ofot_tpu.cli.pipeline run "$@"
fi
