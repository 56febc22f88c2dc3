"""tools/tune_caps.py: occupancy measurement + caps recommendation.

The autotuner is the capacity-knob story's front door (SURVEY §5
long-context analogue: static caps + overflow counters + tuning); these
tests pin the synthetic-room source, the stats JSON roundtrip, and the
shape of the emitted CAPS block."""
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(args):
    return subprocess.run(
        [sys.executable, str(ROOT / "tools" / "tune_caps.py"), *args],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
             "HOME": "/root"})


def test_synthetic_dump_and_stats_roundtrip(tmp_path):
    stats = tmp_path / "occ.json"
    r = _run(["--synthetic", "4", "--dump_stats", str(stats)])
    assert r.returncode == 0, r.stderr
    out1 = r.stdout
    assert "INPUT_CAP:" in out1 and "FINE_CAP:" in out1
    # every emitted cap is a positive multiple of 128
    for line in out1.splitlines():
        if ":" in line and not line.startswith("#"):
            tail = line.rsplit(":", 1)[1].strip()
            if tail.isdigit():
                v = int(tail)
                assert v > 0 and v % 128 == 0, line
    blob = json.loads(stats.read_text())
    assert blob["n_scenes"] == 4
    assert "1" in blob["per_stride"] and len(blob["fine"]) == 4 * 18

    # feeding the stats back reproduces the same recommendation
    r2 = _run(["--stats", str(stats)])
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == out1


def test_stride_caps_monotone_decreasing(tmp_path):
    stats = tmp_path / "occ.json"
    _run(["--synthetic", "3", "--dump_stats", str(stats)])
    blob = json.loads(stats.read_text())
    per = {int(k): max(v) for k, v in blob["per_stride"].items()}
    strides = sorted(per)
    for a, b in zip(strides, strides[1:]):
        assert per[a] >= per[b]
