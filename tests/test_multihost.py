"""parallel/multihost.py coverage (round-1 verdict: the only never-run
module). Two layers:

  * in-process: pod_mesh shape/axis properties on the 8-device CPU mesh,
    initialize()'s single-process no-op.
  * cross-process: a REAL 2-process jax.distributed bring-up on localhost
    (CPU backend) — each subprocess calls multihost.initialize with a
    shared coordinator, builds pod_mesh(tp=local_count), and psums across
    the dp (cross-process) axis.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from squeezellm_tpu.parallel import multihost


def test_initialize_single_process_noop():
    # must not raise and must not attempt a coordinator bring-up
    multihost.initialize(num_processes=1)
    multihost.initialize()  # no env hints either


def test_pod_mesh_shape_and_axis_order():
    mesh = multihost.pod_mesh(tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (len(jax.devices()) // 4, 4)
    assert multihost.is_primary()


def test_pod_mesh_rejects_indivisible():
    with pytest.raises(ValueError):
        multihost.pod_mesh(tp=3)


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from squeezellm_tpu.parallel import multihost

coord, pid = sys.argv[1], int(sys.argv[2])
multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert multihost.is_primary() == (pid == 0)

mesh = multihost.pod_mesh()  # tp = local device count (2) -> dp = 2 hosts
assert mesh.devices.shape == (2, 2), mesh.devices.shape
# every tp row must be single-process (ICI), dp spans processes (DCN)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1

@jax.jit
def allsum(x):
    return jax.lax.psum(x, ("dp", "tp"))

from jax.experimental.shard_map import shard_map
f = shard_map(allsum, mesh=mesh, in_specs=P("dp", "tp"), out_specs=P())
ones = jax.make_array_from_callback(
    (2, 2), NamedSharding(mesh, P("dp", "tp")),
    lambda idx: np.ones((1, 1), np.float32) * (pid + 1),
)
out = f(ones)
# process 0 shards contribute 1 each, process 1 shards 2 each -> 6
np.testing.assert_allclose(np.asarray(jax.device_get(out)), 6.0)
print("WORKER_OK", pid)
"""


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROCESS") == "1",
                    reason="multiprocess smoke disabled")
def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(sys.path)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
