"""True multi-process data-parallel test: two local processes join via the
jax.distributed coordinator (each 4 virtual CPU devices → one 8-device data
mesh), shard the dataset by process, train a few steps, and must end with
bit-identical parameters (XLA collectives did the gradient reduction)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
proc_id = int(sys.argv[1]); coord = sys.argv[2]; outdir = sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
assert jax.process_count() == 2
assert jax.device_count() == 8
sys.path.insert(0, {repo!r})
import numpy as np, jax.numpy as jnp, optax
from jax.sharding import NamedSharding, PartitionSpec as P
from wav2letter_tpu.parallel import make_mesh, replicate
from wav2letter_tpu.parallel.mesh import DATA_AXIS, MeshSpec

mesh = make_mesh(MeshSpec(8, 1))
w = jnp.ones((16, 8)) * 0.1
w = replicate(mesh, w)
tx = optax.sgd(0.1)
opt = replicate(mesh, tx.init(w))

# per-process shard of the global batch (global 8 rows, 4 per process)
rng = np.random.RandomState(0)
gx = rng.randn(8, 16).astype(np.float32)
gy = rng.randn(8, 8).astype(np.float32)
lo = proc_id * 4
from jax.experimental import multihost_utils
x = multihost_utils.host_local_array_to_global_array(
    gx[lo:lo+4], mesh, P(DATA_AXIS))
y = multihost_utils.host_local_array_to_global_array(
    gy[lo:lo+4], mesh, P(DATA_AXIS))

@jax.jit
def step(w, opt, x, y):
    def lf(w):
        return jnp.mean((x @ w - y) ** 2)
    l, g = jax.value_and_grad(lf)(w)
    u, opt = tx.update(g, opt, w)
    return optax.apply_updates(w, u), opt, l

for _ in range(5):
    w, opt, l = step(w, opt, x, y)
np.save(os.path.join(outdir, f"w{proc_id}.npy"), np.asarray(w.addressable_data(0)))
np.save(os.path.join(outdir, f"loss{proc_id}.npy"), np.asarray(l))
"""


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_dp(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("{repo!r}", repr(REPO)))
    coord = f"127.0.0.1:{free_port()}"
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
    w0 = np.load(tmp_path / "w0.npy")
    w1 = np.load(tmp_path / "w1.npy")
    np.testing.assert_array_equal(w0, w1)  # replicas identical after psums
    l0 = np.load(tmp_path / "loss0.npy")
    l1 = np.load(tmp_path / "loss1.npy")
    np.testing.assert_allclose(l0, l1)
