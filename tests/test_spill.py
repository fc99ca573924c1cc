"""Object-store spill stress (round-4 verdict item 5): the same build +
minhash chain run with plasma capped far below the data volume must
spill, complete, and produce bit-identical results to an uncapped run.
Subprocess-orchestrated: each arm owns a fresh Ray session with its own
object_store_memory (immutable after init). ~60 s wall — marked slow."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spill_identity_under_memory_pressure():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "spill_stress.py"),
         "--rows", "60000", "--cap", "100000000"],
        cwd=REPO, capture_output=True, text=True, timeout=580)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith('{"rows"')][-1]
    out = json.loads(line)
    assert out["identical"], out
    assert out["uncapped"]["spilled_bytes"] == 0
    # the cap must actually have forced the spill path
    assert out["capped"]["spilled_bytes"] > 10_000_000, out["capped"]
