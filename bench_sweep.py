"""Serial A/B sweep driver for bench_profile.py (round-3 lever ranking).

Runs bench_profile.py in a fresh subprocess per configuration (so env
flags and the donated-buffer state reset cleanly) and prints one line
per config. Configs are ordered so the persistent compile cache warms
incrementally.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (label, env overrides)
    ("baseline", {}),
    ("conv_save", {"BENCH_REMAT_POLICY": "dots_noexpand_conv"}),
    ("dropout0", {"BENCH_DROPOUT": "0"}),
    ("no_bn", {"BENCH_BATCHNORM": "0"}),
    ("no_flash", {"CAT_TPU_FLASH_ATTN": "0"}),
    ("cells1", {"BENCH_CELLS": "1"}),
    ("batch128", {"BENCH_BATCH": "128",
                  "BENCH_REMAT_POLICY": "dots_noexpand_conv"}),
]


def main():
    names = sys.argv[1:]
    for label, env in CONFIGS:
        if names and label not in names:
            continue
        e = dict(os.environ)
        e.setdefault("BENCH_ONLY", "enc")
        e.setdefault("BENCH_STEPS", "6")
        e.update(env)
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_profile.py")],
            env=e, capture_output=True, text=True, timeout=1800)
        line = ""
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        try:
            rec = json.loads(line) if line else {}
        except json.JSONDecodeError:
            rec = {}
        rec["config"] = label
        if p.returncode != 0:
            rec["error"] = (p.stderr or "")[-300:]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
