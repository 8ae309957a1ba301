"""Floor hunt: alternate single trials at two parallelism levels over
a long period to converge each level's min-of-N wall-time floor.

On this shared VM, contention only ever inflates a wall time, so the
minimum over trials spread across load windows estimates clean-host
performance (BENCH/BASELINE.md "Measurement discipline").  The
per-level floors feed the pooled scaling-efficiency estimate; this
script exists because one level's floor can converge while the
other's hasn't (asymmetric contention: neighbor load inflates a
wide job more than a narrow one, so waiting for one clean
*same-window pair* takes far longer than catching each level's
clean window independently).

Reuses scripts/scaling_bench.py --generate/--worker (identical input:
datagen is seeded, n_triples must match across all pooled runs).

Usage: python scripts/floor_hunt.py [n_rounds] [level...]
  default: 6 rounds over levels 8 2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SB = os.path.join(REPO, "scripts", "scaling_bench.py")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    levels = [int(a) for a in sys.argv[2:]] or [8, 2]
    work = tempfile.mkdtemp(prefix="tildener_floorhunt_")
    pages = os.path.join(work, "pages")
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "32g")
    env["SPARK_GRAFT_TRIALS"] = "1"
    subprocess.run([sys.executable, SB, "--generate", pages],
                   capture_output=True, text=True, cwd=REPO,
                   check=True, env=env)
    best: dict[int, float] = {}
    for r in range(rounds):
        for cpus in levels:
            out = subprocess.run(
                [sys.executable, SB, "--worker", str(cpus), pages],
                capture_output=True, text=True, cwd=REPO, check=True,
                env=env)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
            best[cpus] = min(best.get(cpus, 1e18), rec["sec"])
            print(f"round {r}: {line}", flush=True)
    print(json.dumps({"floors_sec": {str(k): v for k, v in
                                     sorted(best.items())}}), flush=True)


if __name__ == "__main__":
    main()
