#!/usr/bin/env bash
# Provision a dev environment for vectordb_tpu — the *providing* half of
# the reference's Nix flake (flake.nix:18-36 provides a pinned Rust
# toolchain; this provides the pinned Python/JAX/toolchain stack), with
# tools/check_env.py as the asserting half.
#
# Usage:
#   tools/provision.sh            # create .venv, install pins, build native
#   tools/provision.sh --check    # verify only (no changes)
#   VENV=/path tools/provision.sh # custom venv location
#
# On hosts where installation is forbidden (e.g. the hermetic benchmark
# host this framework is developed on, where the stack is baked into the
# image), run with --check: provisioning degrades to verification.
set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
VENV="${VENV:-$ROOT/.venv}"
PY="${PYTHON:-python3}"

if [[ "${1:-}" == "--check" ]]; then
    exec "$PY" "$ROOT/tools/check_env.py"
fi

echo "== toolchain =="
for tool in g++ make; do
    command -v "$tool" >/dev/null || {
        echo "missing: $tool (apt install build-essential)"; exit 1; }
done
g++ --version | head -1

echo "== python env ($VENV) =="
if [[ ! -d "$VENV" ]]; then
    "$PY" -m venv "$VENV"
fi
# shellcheck disable=SC1091
source "$VENV/bin/activate"
python -m pip install --quiet --upgrade pip

# install the exact pins from pyproject.toml (runtime + dev). On TPU
# hosts swap the jax pin for the matching jax[tpu] wheel:
#   pip install "jax[tpu]==<ver>" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
python - << 'EOF'
import subprocess
import sys
import tomllib
from pathlib import Path

spec = tomllib.loads(Path("pyproject.toml").read_text())
deps = list(spec["project"]["dependencies"])
deps += spec["project"]["optional-dependencies"]["dev"]
print("installing:", " ".join(deps))
subprocess.check_call([sys.executable, "-m", "pip", "install",
                       "--quiet", *deps])
EOF

echo "== native persistence core (g++, auto-cached) =="
python - << 'EOF'
import sys
sys.path.insert(0, ".")
from vectordb_tpu.persistence.native_lib import get_native
print("walcore/native:", "built" if get_native() is not None else
      "unavailable (Python fallback active)")
EOF

echo "== verify =="
python tools/check_env.py
echo "provisioned. activate with: source $VENV/bin/activate"
