#!/bin/bash
# Lint gate (counterpart of reference scripts/lint_format_code.sh).
set -e
python -m pyflakes speech_masters_thesis_tpu scripts tools train.py bench.py 2>/dev/null \
    || python -m py_compile $(git ls-files '*.py')
echo "lint ok"
