"""Driver-contract test for `__graft_entry__.py`.

The round driver invokes ``dryrun_multichip(n)`` in a *fresh process with no
env preparation* — on this image that process sees the single axon TPU device
unless the function itself forces a virtual CPU mesh (round-1 VERDICT weak #1:
the recorded dryrun crashed for exactly this reason). This test reproduces the
raw driver invocation: subprocess, XLA_FLAGS/JAX_PLATFORMS scrubbed from the
environment, no conftest in sight.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_configures_without_env_prep():
    env = dict(os.environ)
    # Scrub everything the conftest / caller may have set: the driver sets none.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=REPO_ROOT, env=env, capture_output=True, timeout=840,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    assert "DRYRUN_OK" in proc.stdout.decode()


def test_make_mesh_raises_on_underprovisioned_device_count():
    import jax
    import pytest

    from structured_alignment_vqa_tpu.parallel import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="devices but only"):
        make_mesh(n + 1)
