#!/usr/bin/env python
"""Pre-snapshot ship check (VERDICT r4 item 8).

Round 4 shipped a default-flag flip (PACK_SCATTER=1) that was a measured
2.6x end-to-end regression, plus a red default test tier, because nothing
enforced the repo's own rule: "ONLY trust end-to-end reconstruct_surface /
bench.py timings for accept/reject decisions". This script enforces it:

1. Extracts every `os.environ.get("SPLASHSURF_TPU_*", default)` default
   from the package and compares against the committed manifest
   ``tools/flag_defaults.json``. Any CHANGED default fails the check unless
   BENCHLOG.md contains a row tagged with the current commit hash (short,
   ``git rev-parse --short HEAD``) — i.e. a same-commit end-to-end A/B.
   After recording the BENCHLOG row, re-run with ``--accept`` to rewrite
   the manifest in the same commit.
2. With ``--tests`` (default on; ``--no-tests`` to skip) runs the default
   test tier ``python -m pytest tests/ -q`` and fails on any red.

Usage:
  python tools/ship_check.py            # full check (flags + tests)
  python tools/ship_check.py --no-tests # flag-manifest check only
  python tools/ship_check.py --accept   # bless current defaults
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "flag_defaults.json")
FLAG_RE = re.compile(
    r"""environ\.get\(\s*["'](SPLASHSURF_TPU_[A-Z0-9_]+)["']\s*,\s*["']([^"']*)["']"""
)


def current_defaults() -> dict:
    flags: dict = {}
    pkg = os.path.join(REPO, "splashsurf_tpu")
    for dirpath, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            with open(os.path.join(dirpath, f)) as fh:
                for name, default in FLAG_RE.findall(fh.read()):
                    prev = flags.get(name)
                    if prev is not None and prev != default:
                        print(
                            f"ERROR: flag {name} has inconsistent defaults "
                            f"across files: {prev!r} vs {default!r}"
                        )
                        sys.exit(2)
                    flags[name] = default
    return flags


def head_hash() -> str:
    return subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()


def check_flags(accept: bool) -> bool:
    flags = current_defaults()
    if accept:
        with open(MANIFEST, "w") as fh:
            json.dump(flags, fh, indent=2, sort_keys=True)
            fh.write("\n")
        print(f"manifest updated: {MANIFEST} ({len(flags)} flags)")
        return True
    if not os.path.exists(MANIFEST):
        print(f"no manifest at {MANIFEST}; run with --accept to create it")
        return False
    with open(MANIFEST) as fh:
        blessed = json.load(fh)
    changed = {
        k: (blessed.get(k), v)
        for k, v in flags.items()
        if blessed.get(k) != v
    }
    removed = {k: v for k, v in blessed.items() if k not in flags}
    if not changed and not removed:
        print(f"flag defaults: OK ({len(flags)} flags match the manifest)")
        return True
    h = head_hash()
    benchlog = os.path.join(REPO, "BENCHLOG.md")
    logged = False
    if os.path.exists(benchlog):
        with open(benchlog) as fh:
            logged = h in fh.read()
    print("flag defaults CHANGED vs tools/flag_defaults.json:")
    for k, (old, new) in changed.items():
        print(f"  {k}: {old!r} -> {new!r}")
    for k, v in removed.items():
        print(f"  {k}: {v!r} -> (removed)")
    if logged:
        print(
            f"BENCHLOG.md mentions HEAD ({h}) — measured; run "
            "`python tools/ship_check.py --accept` to bless the new defaults"
        )
        return False
    print(
        f"\nREFUSED: no BENCHLOG.md row tagged with HEAD ({h}). A default "
        "flip is a perf claim; record a same-commit end-to-end A/B in "
        "BENCHLOG.md (mention the commit hash), then --accept."
    )
    return False


def run_tests() -> bool:
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    print("running default test tier (python -m pytest tests/ -q) ...")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO, env=env
    )
    ok = r.returncode == 0
    print("default tier:", "GREEN" if ok else f"RED (exit {r.returncode})")
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--accept", action="store_true",
                    help="bless the current defaults into the manifest")
    ap.add_argument("--no-tests", action="store_true",
                    help="skip the default test tier")
    args = ap.parse_args()
    ok = check_flags(args.accept)
    if ok and not args.no_tests and not args.accept:
        ok = run_tests()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
