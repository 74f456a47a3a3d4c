"""Multi-host (multi-process) distributed training test on CPU.

Spawns two real processes that form a jax.distributed cluster (the TPU-pod
topology: one process per host, 4 fake devices each), build a global 8-device
mesh, assemble per-process batch shards via ``put_batch``, and run one
training step. Verifies both processes compute the identical global loss —
the cross-host equivalent of the reference's DDP allreduce semantics
(`main_itp_ddp_tar_super_node.py:153-158`), which the reference itself could
only validate by submitting live Azure jobs (SURVEY.md section 4).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
import jax.numpy as jnp
from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.parallel import create_train_state, make_train_step, make_mesh
from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state

assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

cfg = tiny_test_config(dropout_rate=0.0)
model = AttModelX3(cfg)
# each process holds its local half of the global batch of 8
full = synthetic_batch(cfg, batch=8, lv=4, lq=5, ls=10, seed=7)
local = jax.tree.map(lambda x: x[pid * 4:(pid + 1) * 4], full)

tx = adam(1e-3)
state = create_train_state(model, jax.random.key(0), local, tx)
mesh = make_mesh(model_parallel=1)
state = shard_state(state, mesh)
batch = put_batch(local, mesh)
step = make_train_step(model, tx, cfg)
state, metrics = step(state, batch, jax.random.key(3))
print("RESULT", json.dumps({
    "pid": pid,
    "loss": float(metrics["loss"]),
    "n": float(metrics["n"]),
    "step": int(state.step),
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    results = {}
    logs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        logs.append(err.decode()[-2000:])
        assert p.returncode == 0, f"worker failed:\n{err.decode()[-3000:]}"
        for line in out.decode().splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, logs
    # both processes see the same *global* metrics (loss over the full batch of 8)
    assert results[0]["n"] == 8.0
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)
    assert results[0]["step"] == results[1]["step"] == 1
