"""On-chip compile+parity check for the Pallas EMD auction kernel.

Round-5 lesson: the interpret-mode parity test cannot see Mosaic
block-shape constraints — the original (1, 1) SMEM output block passed
interpret but was rejected by the TPU lowering, which would have crashed
chair-scale eval on hardware. This test compiles and runs the kernel on
the real chip (subprocess, clean env — the suite process is pinned to
the virtual CPU mesh) and asserts parity vs the exact-fp32 XLA auction.

Gated on LION_RUN_TPU_TESTS=1 (the TPU tunnel admits ONE process).
On-chip invocation:  LION_RUN_TPU_TESTS=1 python -m pytest tests/ -q -m tpu
"""
import os
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = textwrap.dedent("""
    import sys
    sys.path.insert(0, %r)
    import jax, jax.numpy as jnp, numpy as np
    from lion_tpu.ops.pallas.emd import emd_approx_pallas
    from lion_tpu.ops.emd import emd_approx
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(4, 256, 3).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(4, 256, 3).astype(np.float32) * 0.2)
    got = np.asarray(emd_approx_pallas(a, b))
    want = np.asarray(emd_approx(a, b))
    rel = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-9)))
    print("rel", rel)
    assert rel < 2e-3, rel
    print("EMD HW OK")
""") % (_REPO,)


@pytest.mark.tpu
@pytest.mark.skipif(not os.environ.get("LION_RUN_TPU_TESTS"),
                    reason="needs the real TPU (set LION_RUN_TPU_TESTS=1)")
def test_emd_pallas_compiles_and_matches_on_hw():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _SNIPPET],
                         capture_output=True, text=True, timeout=1200,
                         env=env, cwd=_REPO)
    sys.stdout.write(out.stdout)
    sys.stderr.write(out.stderr)
    assert out.returncode == 0, f"EMD HW check exited {out.returncode}"
    assert "EMD HW OK" in out.stdout
