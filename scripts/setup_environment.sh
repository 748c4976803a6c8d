#!/usr/bin/env bash
# Environment setup + sanity check (role of the reference's setup.sh and
# profiler/scripts/setup_environment.sh: install deps, wire the native
# library, verify the accelerator).  Here deps are baked into the image,
# so this builds the native marshaling library and verifies the stack.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native marshaling library =="
if command -v cc >/dev/null 2>&1 || command -v gcc >/dev/null 2>&1; then
  make -C native 2>/dev/null || echo "(native build skipped: $?)"
else
  echo "(no C compiler; numpy fallback will be used)"
fi

echo "== python stack =="
python - <<'EOF'
import jax, numpy
print("jax", jax.__version__, "numpy", numpy.__version__)
print("devices:", jax.devices())
import octopuszk_tpu
print("octopuszk_tpu", octopuszk_tpu.__version__, "imports OK")
from octopuszk_tpu.utils import native
print("native marshal:", "loaded" if native.available() else "numpy fallback")
EOF

echo "== compile caches =="
ls -d ~/.cache/octopuszk_tpu_jax* 2>/dev/null || echo "(none yet)"
echo "environment OK"
