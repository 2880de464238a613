"""Race-detection gate: the native runtime must be ThreadSanitizer-clean
(the reference's concurrency layer had a tolerated RNG data race,
path-trace.h:56 — SURVEY §5.2 requires we do better)."""

import os
import shutil
import subprocess

import pytest

RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ptx", "runtime")


@pytest.mark.slow
@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_runtime_is_tsan_clean():
    r = subprocess.run(["make", "-s", "tsan"], cwd=RUNTIME_DIR,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WARNING: ThreadSanitizer" not in r.stdout + r.stderr
