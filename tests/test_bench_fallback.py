"""bench.py must emit a parseable JSON line and exit 0 when the TPU backend
is unavailable (VERDICT r3 weak #8: round-3's driver capture got a raw
traceback, BENCH_r03.json).  Simulate the outage via PCDET_BENCH_FORCE_OUTAGE.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_outage_emits_structured_skip():
    env = dict(os.environ, PCDET_BENCH_FORCE_OUTAGE='1')
    r = subprocess.run([sys.executable, str(REPO / 'bench.py')],
                       capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith('{')]
    assert lines, r.stdout
    rec = json.loads(lines[-1])
    # the driver's parser needs the standard keys even on a skip
    for key in ('metric', 'value', 'unit', 'vs_baseline'):
        assert key in rec, rec
    assert rec['skipped'] == 'tpu-unavailable'
    # BENCH_r02.json carries the last chip-measured number; the skip record
    # must surface it rather than losing all perf evidence
    assert rec['last_good'] and rec['last_good']['value'] > 0
    assert rec['value'] == rec['last_good']['value']
