#!/usr/bin/env bash
# One-command repo verification, strongest-signal-first. Usage:
#   bash tools/check_all.sh            # lint + tests + driver-mirror sweep
#   bash tools/check_all.sh --quick    # lint + tests only (~9 min)
# Exit code is non-zero on the first failing stage.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 lint (F811 shadow gate) =="
python -m pytest tests/test_lint.py -q

echo "== 2/4 full test suite =="
python -m pytest tests/ -q

if [[ "${1:-}" == "--quick" ]]; then
  echo "quick mode: skipping sweep + bench"; exit 0
fi

echo "== 3/4 bare-session oracle sweep at sf0.01 (driver mirror) =="
python tools/bare_sweep.py /root/testdata/sf0.01

echo "== 4/4 bench (sf0.1, one JSON line) =="
python bench.py 2>/dev/null | tail -1
