"""Probe-gated floor hunt: spend trials ONLY in clean host windows.

The plain interleaved hunt (floor_hunt.py) wastes most of its trials
when the shared VM is contended for tens of minutes at a stretch —
every trial inflates and the per-level floors never move.  This
variant polls the one-core noise probe and launches a trial only when
both probe readings are near idle (~105 ms calibration), so a long
mostly-sleeping run converges the clean-host floors with a handful of
trials.  Same worker/input as scaling_bench.py (seeded datagen;
n_triples must stay bit-identical across all trials).

Usage: python scripts/clean_window_hunt.py [minutes] [level...]
  default: 60 minutes over levels 8 32 2 (round-robin, clean-gated)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SB = os.path.join(REPO, "scripts", "scaling_bench.py")
sys.path.insert(0, REPO)

from tildener_spark.session import noise_probe  # noqa: E402

CLEAN_MS = 115.0  # ~105 ms idle calibration + slack


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    levels = [int(a) for a in sys.argv[2:]] or [8, 32, 2]
    deadline = time.time() + minutes * 60
    work = tempfile.mkdtemp(prefix="tildener_cleanhunt_")
    pages = os.path.join(work, "pages")
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "32g")
    env["SPARK_GRAFT_TRIALS"] = "1"
    subprocess.run([sys.executable, SB, "--generate", pages],
                   capture_output=True, text=True, cwd=REPO,
                   check=True, env=env)
    best: dict[int, float] = {}
    idx = 0
    while time.time() < deadline:
        pr = noise_probe()
        if max(pr["probe_cpu_ms"], pr["probe_mem_ms"]) > CLEAN_MS:
            print(json.dumps({"skip": pr}), flush=True)
            time.sleep(45)
            continue
        cpus = levels[idx % len(levels)]
        idx += 1
        out = subprocess.run(
            [sys.executable, SB, "--worker", str(cpus), pages],
            capture_output=True, text=True, cwd=REPO, check=True,
            env=env)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
        best[cpus] = min(best.get(cpus, 1e18), rec["sec"])
        print(line, flush=True)
    print(json.dumps({"floors_sec": {str(k): v for k, v in
                                     sorted(best.items())}}), flush=True)


if __name__ == "__main__":
    main()
