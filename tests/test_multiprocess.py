"""Multi-process (DCN-path) simulation — VERDICT r1 weak #8.

Two real OS processes, each with 4 virtual CPU devices, joined by
jax.distributed into one 8-device world: exercises
parallel/distributed.py-style initialization, the
make_array_from_process_local_data branch of parallel.mesh.shard_batch,
and a cross-process global reduction — the actual multi-host feed path
the trainer uses, not a monkeypatch.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[3])
from workoutdetector_tpu.parallel.mesh import create_mesh, shard_batch

assert jax.process_count() == 2
assert len(jax.devices()) == 8
assert len(jax.local_devices()) == 4
mesh = create_mesh(model=1)

# per-process LOCAL half of the global batch (the multi-host feed:
# shard_batch routes through make_array_from_process_local_data)
local = np.arange(8, dtype=np.float32) + 100 * pid
x = shard_batch(local, mesh)
assert x.shape == (16,)  # global shape spans both processes

total = jax.jit(lambda v: jnp.sum(v),
                in_shardings=(NamedSharding(mesh, P("data")),),
                out_shardings=NamedSharding(mesh, P()))(x)
expected = float(np.arange(8).sum() * 2 + 100 * 8)
assert float(total) == expected, (float(total), expected)
print(f"OK {pid} {float(total)}")
"""


def test_two_process_global_reduction(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(port), str(i),
                          repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i} 856.0" in out, out


WORKER_FSDP = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[3])
from workoutdetector_tpu.parallel.mesh import (create_mesh, param_spec,
                                               shard_batch)

mesh = create_mesh(model=1)  # 8 devices across 2 processes
# FSDP param layout spanning BOTH hosts: (16, 64) dense kernel, out dim
# sharded over 'data' -> each of the 8 devices holds (16, 8)
spec = param_spec((16, 64), mesh, fsdp_axis="data")
assert spec == P(None, "data"), spec
rng = np.random.default_rng(7)
w_np = rng.standard_normal((16, 64)).astype(np.float32)
sharding = NamedSharding(mesh, spec)
w = jax.make_array_from_callback((16, 64), sharding,
                                 lambda idx: w_np[idx])
shards = w.addressable_shards
assert len(shards) == 4 and shards[0].data.shape == (16, 8), \
    (len(shards), shards[0].data.shape)

# batch sharded over 'data' per host (multi-host feed path)
x_local = rng.standard_normal((4, 16)).astype(np.float32) + pid
x = shard_batch(x_local, mesh)
y = jax.jit(lambda w, x: x @ w,
            in_shardings=(sharding, NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P()))(w, x)
# expected: both hosts' local batches stacked in process order — each
# process drew the same base rows from the seeded rng, offset by pid
base = np.random.default_rng(7)
base.standard_normal((16, 64))  # skip the w draw
rows = base.standard_normal((4, 16)).astype(np.float32)
x_global = np.concatenate([rows + 0, rows + 1])
np.testing.assert_allclose(np.asarray(y), x_global @ w_np,
                           rtol=1e-5, atol=1e-5)
print(f"OK-FSDP {pid}")
"""


WORKER_SLICE = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[3])
from workoutdetector_tpu.parallel.mesh import (create_mesh, dp_entry,
                                               dp_size, param_spec,
                                               shard_batch)

# hybrid multi-slice mesh over two real processes: the 'slice' axis IS
# the process (DCN) boundary — jax.devices() orders by process, and
# create_mesh groups contiguous chunks onto 'slice'
mesh = create_mesh(slices=2, model=2)
assert dict(mesh.shape) == {"slice": 2, "data": 2, "model": 2}, mesh.shape
for si in range(2):
    procs = {d.process_index for d in mesh.devices[si].flat}
    assert procs == {si}, (si, procs)  # each slice lives on ONE process

# params: partitioned over 'model', REPLICATED across the slice/process
# boundary — the only DCN-crossing collective is the grad all-reduce
spec = param_spec((16, 64), mesh)
assert spec == P("model", None), spec  # dense kernel: in-features sharded
rng = np.random.default_rng(7)
w_np = rng.standard_normal((16, 64)).astype(np.float32)
sharding = NamedSharding(mesh, spec)
w = jax.make_array_from_callback((16, 64), sharding, lambda idx: w_np[idx])
# model-sharded halves within the process, replicated over slice/data
assert w.addressable_shards[0].data.shape == (8, 64)

# batch spans slice×data: global 8 rows = 4 per process
x_local = rng.standard_normal((4, 16)).astype(np.float32) + pid
x = shard_batch(x_local, mesh)
assert x.shape == (8, 16) and x.sharding.spec == P(("slice", "data"))
assert dp_size(mesh) == 4

# global matmul + mean over the whole (cross-DCN) batch matches numpy
y = jax.jit(lambda w, x: jnp.mean(x @ w),
            in_shardings=(sharding, NamedSharding(mesh, P(dp_entry(mesh)))),
            out_shardings=NamedSharding(mesh, P()))(w, x)
base = np.random.default_rng(7)
base.standard_normal((16, 64))
rows = base.standard_normal((4, 16)).astype(np.float32)
x_global = np.concatenate([rows + 0, rows + 1])
np.testing.assert_allclose(float(y), float((x_global @ w_np).mean()),
                           rtol=1e-5)
print(f"OK-SLICE {pid}")
"""


def test_two_process_slice_mesh(tmp_path):
    """Hybrid multi-slice mesh across two real processes: each slice's
    devices live on exactly one process (slice axis == DCN boundary),
    params model-shard within a slice and replicate across slices, the
    batch spans slice×data, and a global reduction matches numpy."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER_SLICE, str(port),
                          str(i), repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("slice-mesh multi-process workers timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK-SLICE {i}" in out, out


WORKER_LOADER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[3])
from workoutdetector_tpu.data.loader import DataLoader
from workoutdetector_tpu.parallel.mesh import (create_mesh, host_batch_shard,
                                               shard_batch)

class Toy:
    def __len__(self):
        return 16
    def __getitem__(self, idx, rng):
        return (np.full((3,), idx, np.uint8) +
                rng.integers(0, 100, (3,), dtype=np.uint8), idx)

mesh = create_mesh(model=1)
# the loader shard comes from the batch SHARDING, not process_count:
# pure DP -> each host owns half the rows ...
assert host_batch_shard(mesh) == (pid, 2), host_batch_shard(mesh)
# ... but a model axis spanning both hosts replicates the batch rows
# across processes -> every host must load the FULL batch
mesh_tp = create_mesh(model=8)
assert host_batch_shard(mesh_tp) == (0, 1), host_batch_shard(mesh_tp)
# and on the hybrid slice mesh each host is again half the global batch
mesh_sl = create_mesh(slices=2, model=2)
assert host_batch_shard(mesh_sl) == (pid, 2), host_batch_shard(mesh_sl)

# THE trainer feed: each process loads only its block of the global batch
shard_id, num_shards = host_batch_shard(mesh)
ld = DataLoader(Toy(), batch_size=8, shuffle=True, num_workers=2, seed=5,
                shard_id=shard_id, num_shards=num_shards)
ld.set_epoch(1)
# the single-host ground truth, computed identically in both processes
ref = DataLoader(Toy(), batch_size=8, shuffle=True, num_workers=2, seed=5)
ref.set_epoch(1)
for (lx, ly), (fx, fy) in zip(ld, ref):
    assert lx.shape == (4, 3)  # local block = global/2
    gx, gy = shard_batch((lx, ly), mesh)
    assert gx.shape == (8, 3) and gy.shape == (8,)
    # position-weighted checksums prove content AND ordering of the
    # assembled global array match the single-host batch
    wx = (np.arange(fx.size, dtype=np.float32) + 1).reshape(fx.shape)
    wy = np.arange(8, dtype=np.float32) + 1
    cks = jax.jit(
        lambda x, y: (jnp.sum(x.astype(jnp.float32) * wx),
                      jnp.sum(y.astype(jnp.float32) * wy)),
        in_shardings=(NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P()))(gx, gy)
    assert float(cks[0]) == float((fx.astype(np.float32) * wx).sum())
    assert float(cks[1]) == float((fy.astype(np.float32) * wy).sum())
print(f"OK-LOADER {pid}")
"""


def test_two_process_sharded_loader_feed(tmp_path):
    """The full multi-host input pipeline: two real processes each run
    the process-sharded DataLoader (trainer._loader wiring) and feed
    their local blocks through shard_batch; the assembled global batch
    is bit-identical (position-weighted checksum) to the single-host
    loader's output."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER_LOADER, str(port),
                          str(i), repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("sharded-loader multi-process workers timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK-LOADER {i}" in out, out


def test_two_process_fsdp_param_layout(tmp_path):
    """FSDP across HOSTS: a param sharded over 'data' spans two real
    processes (4 shards each), and a jitted matmul over the global mesh
    matches numpy — the multi-host ZeRO-3 feed+compute path."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER_FSDP, str(port),
                          str(i), repo],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("fsdp multi-process workers timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK-FSDP {i}" in out, out
