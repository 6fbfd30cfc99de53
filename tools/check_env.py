"""Verify the live environment against pyproject.toml's pins — the
mechanical half of the reference's Nix-flake guarantee (flake.nix:18-36):
where nix *provides* the pinned toolchain, this *asserts* it, failing
loudly with what to fix.

Usage: python tools/check_env.py   (exit 0 = environment matches)
"""

from __future__ import annotations

import importlib.metadata as md
import re
import subprocess
import sys
import tomllib
from pathlib import Path


def main() -> int:
    root = Path(__file__).resolve().parent.parent
    spec = tomllib.loads((root / "pyproject.toml").read_text())
    problems = []

    want_py = spec["project"]["requires-python"]
    m = re.match(r">=(\d+)\.(\d+)", want_py)
    if m and sys.version_info < (int(m.group(1)), int(m.group(2))):
        problems.append(f"python {sys.version.split()[0]} < {want_py}")

    deps = list(spec["project"]["dependencies"])
    deps += spec["project"].get("optional-dependencies", {}).get("dev", [])
    for dep in deps:
        name, _, want = dep.partition("==")
        try:
            have = md.version(name)
        except md.PackageNotFoundError:
            problems.append(f"{name}: not installed (want {want})")
            continue
        if want and have != want:
            problems.append(f"{name}: {have} installed, {want} pinned")

    native = spec.get("tool", {}).get("vectordb-tpu", {}).get("native", {})
    cxx = native.get("cxx", "g++")
    try:
        out = subprocess.run([cxx, "--version"], capture_output=True,
                             text=True, check=True).stdout.splitlines()[0]
        ver = re.search(r"(\d+)\.(\d+)\.\d+", out)
        minv = tuple(int(x) for x in
                     native.get("cxx_min_version", "0.0").split("."))
        if ver and (int(ver.group(1)), int(ver.group(2))) < minv:
            problems.append(f"{cxx}: {out!r} older than {minv}")
    except (OSError, subprocess.CalledProcessError):
        problems.append(f"{cxx}: not found")

    if problems:
        print("environment does NOT match pyproject.toml pins:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print("environment matches pyproject.toml pins")
    return 0


if __name__ == "__main__":
    sys.exit(main())
