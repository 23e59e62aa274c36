"""Pin the fused-SA compiled-vs-interpret HW check in CI (VERDICT r4 weak
#6): the count-gated `pl.when` chunks (ops/pallas/sa_fused.py) are
data-dependent, so their Mosaic lowering is only provable on the real
chip. `scripts/check_sa_hw.py` compares compiled TPU output against
interpret mode (the CPU-tested semantics) across sparse/dense hit
regimes; this test runs it as a subprocess (tests/conftest.py pins this
process to the virtual CPU mesh, so the chip is only reachable from a
clean environment) and asserts every regime reports OK.

Gated on LION_RUN_TPU_TESTS=1 because the TPU tunnel admits ONE process:
running it mid-suite while another TPU job is live would wedge the chip.
On-chip invocation:  LION_RUN_TPU_TESTS=1 python -m pytest tests/ -q -m tpu
"""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.skipif(not os.environ.get("LION_RUN_TPU_TESTS"),
                    reason="needs the real TPU (set LION_RUN_TPU_TESTS=1)")
def test_sa_fused_compiled_matches_interpret_on_hw():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "check_sa_hw.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=_REPO)
    sys.stdout.write(out.stdout)
    sys.stderr.write(out.stderr)
    assert out.returncode == 0, f"check_sa_hw.py exited {out.returncode}"
    assert "ALL OK" in out.stdout, "fused SA lowering mismatch on HW"
    assert "FAIL" not in out.stdout
