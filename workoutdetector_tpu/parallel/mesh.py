"""Device mesh & sharding helpers.

The TPU-native replacement for the reference's gloo DDP stack (SURVEY §2.8:
torch.distributed.launch + DDPStrategy + all_gather). Here distribution is
declarative: one ``Mesh`` over ICI, ``NamedSharding`` annotations on the
train step's inputs, and XLA inserts the gradient psum — no NCCL/MPI-style
calls anywhere.

The mesh carries two axes from day one — ``data`` (batch/DP) and ``model``
(reserved for tensor/temporal sharding) — so the framework is not DP-only
by construction, even though every reference workload is DP
(SURVEY §2.8 TPU-equivalent note).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                data: int = -1,
                model: int = 1,
                slices: int = 1,
                axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Create a 2D (data, model) mesh — or, with ``slices > 1``, a 3D
    (slice, data, model) **hybrid multi-slice mesh** for multi-pod /
    multi-slice TPU deployments.

    The hybrid layout is the scaling-book recipe for DCN-connected
    slices: the leading ``slice`` axis crosses the slow DCN link and
    carries ONLY the per-step gradient all-reduce (pure data
    parallelism — one latency-tolerant collective per step), while
    ``data`` (DP/FSDP within a slice) and ``model`` (tensor/sp/pp/ep)
    stay inside a slice so their chatty all-gathers / all-to-alls /
    ppermutes ride ICI. Devices are grouped onto the slice axis by
    their real topology (``device.slice_index`` on multi-slice TPU
    hardware) and by contiguous chunks elsewhere (CPU test meshes).

    data == -1 ⇒ use all remaining devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if slices > 1:
        assert n % slices == 0, f"{n} devices not divisible by slices={slices}"
        per = n // slices
        # group by the hardware slice when the backend exposes it so the
        # 'slice' axis really is the DCN boundary; stable-sort keeps the
        # intra-slice device order (ICI neighbors stay adjacent)
        slice_ids = [getattr(d, "slice_index", None) for d in devices]
        distinct = {s for s in slice_ids if s is not None}
        if all(s is not None for s in slice_ids) and len(distinct) > 1:
            # real multi-slice hardware: the requested slice count MUST
            # match the topology — silently chunking across it would put
            # ICI-assumed axes (data/model collectives) on the DCN link.
            # A single distinct id is NOT informative: CPU backends
            # report slice_index=0 on every device of every process
            # (observed jax 0.9 two-process sim), so only enforce when
            # the backend distinguishes slices at all; otherwise fall
            # through to contiguous chunking, which groups by process —
            # the actual DCN boundary in multi-process simulations.
            assert len(distinct) == slices, (
                f"hardware exposes {len(distinct)} slice(s) but "
                f"slices={slices} requested; the 'slice' axis must sit on "
                f"the real DCN boundary")
            devices = sorted(devices, key=lambda d: d.slice_index)
        if data == -1:
            assert per % model == 0, \
                f"{per} devices/slice not divisible by model={model}"
            data = per // model
        assert slices * data * model == n, \
            f"mesh {slices}x{data}x{model} != {n} devices"
        dev_array = np.asarray(devices).reshape(slices, data, model)
        return Mesh(dev_array, axis_names=("slice",) + tuple(axis_names))
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def dp_entry(mesh: Mesh, axis: str = "data"):
    """The PartitionSpec entry for the batch dim: ``('slice', 'data')``
    on a hybrid multi-slice mesh (the global batch spans both the DCN
    and the intra-slice data axis), plain ``'data'`` otherwise."""
    if "slice" in mesh.axis_names and axis == "data":
        return ("slice", axis)
    return axis


def dp_size(mesh: Mesh, axis: str = "data") -> int:
    """Total data-parallel ways: slice × data on a hybrid mesh."""
    n = mesh.shape.get(axis, 1)
    if "slice" in mesh.axis_names and axis == "data":
        n *= mesh.shape["slice"]
    return n


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis (slice × data on
    a hybrid mesh); replicate the rest."""
    return NamedSharding(mesh, P(dp_entry(mesh, axis)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(shape: Sequence[int], mesh: Mesh, axis: str = "model",
               min_per_shard: int = 8, fsdp_axis: Optional[str] = None) -> P:
    """Shape-based PartitionSpec for a parameter (or optimizer-momentum) leaf.

    Makes the ``model`` axis real (not just reserved): large conv kernels
    are sharded over their output-channel dim and dense/fc kernels over
    their input-feature dim, so a (data, model) mesh holds 1/model of each
    big tensor per device; XLA inserts the all-gather/reduce-scatter pair
    on ICI. Leaves too small (or not divisible) stay replicated — BN
    scale/bias, heads with tiny class counts, scalars.

    ``fsdp_axis`` (normally ``'data'``) additionally shards eligible leaves
    over that axis on a DIFFERENT dim — ZeRO-3/FSDP semantics: each
    data-parallel rank holds 1/data of the params and optimizer state, and
    GSPMD inserts the per-use all-gather and the grad reduce-scatter. It
    composes with the tensor sharding: on a (4, 2) mesh a 3×3×256×512
    kernel holds 1/8 of its elements per device.

    Shape-based (not name-based) so the same rule covers params, optax
    momentum buffers, and batch_stats without pytree-path plumbing.

    On a hybrid multi-slice mesh (create_mesh(slices=...)) params are
    NEVER sharded over the 'slice' axis: weights replicate across
    slices, so the only DCN-crossing collective is the per-step gradient
    all-reduce — tensor all-gathers (model axis) and ZeRO gathers (data
    axis) stay on ICI inside each slice.
    """
    n = mesh.shape.get(axis, 1)
    nf = mesh.shape.get(fsdp_axis, 1) if fsdp_axis else 1
    entries = [None] * len(shape)
    if len(shape) == 4:  # conv HWIO → 'model' shards O, fsdp shards I
        if n > 1 and shape[3] % n == 0 and shape[3] // n >= min_per_shard:
            entries[3] = axis
        if nf > 1 and shape[2] % nf == 0 and shape[2] // nf >= min_per_shard:
            entries[2] = fsdp_axis
    elif len(shape) == 3:  # stacked expert kernels (E, in, out) → expert
        # parallelism: 'model' shards the leading (expert) dim so each
        # device holds E/model experts (models/moe.py); fsdp shards 'in'
        if n > 1 and shape[0] % n == 0 and \
                int(np.prod(shape)) // n >= min_per_shard:
            entries[0] = axis
        if nf > 1 and shape[1] % nf == 0 and shape[1] // nf >= min_per_shard:
            entries[1] = fsdp_axis
    elif len(shape) == 2:  # dense (in, out) → 'model' shards in, fsdp out
        if n > 1 and shape[0] % n == 0 and shape[0] // n >= min_per_shard:
            entries[0] = axis
        if nf > 1 and shape[1] % nf == 0 and shape[1] // nf >= min_per_shard:
            entries[1] = fsdp_axis
    elif len(shape) == 1:  # BN scale/bias, biases → fsdp shards the vector
        if nf > 1 and shape[0] % nf == 0 and shape[0] // nf >= min_per_shard:
            entries[0] = fsdp_axis
    if all(e is None for e in entries):  # P() canonical form when unsharded
        return P()
    return P(*entries)


def state_sharding(state: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Pytree of NamedShardings for a TrainState (params + batch_stats +
    opt_state), applying :func:`param_spec` per leaf. ``fsdp=True``
    additionally partitions eligible leaves over the ``data`` axis
    (ZeRO-3 semantics — see :func:`param_spec`)."""
    fsdp_axis = "data" if fsdp else None

    def rule(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, param_spec(shape, mesh,
                                              fsdp_axis=fsdp_axis))

    return jax.tree_util.tree_map(rule, state)


def seq_constrain(x: jax.Array, mesh: Optional[Mesh], spec: P,
                  dims: Sequence[int] = ()) -> jax.Array:
    """``with_sharding_constraint`` with divisibility guards — the hook
    sequence-parallel models use to pin activation layouts.

    ``dims`` lists the dims of ``x`` whose spec entry must divide the
    corresponding mesh axis size (product of sizes for a tuple entry); any
    non-divisible dim makes the whole constraint a no-op rather than an
    XLA error, so the same model code runs on (n, 1) and (n/2, 2) meshes
    and on tiny test shapes. No-mesh ⇒ identity.
    """
    if mesh is None:
        return x
    for d in dims:
        entry = spec[d]
        if entry is None:
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        n = int(np.prod([mesh.shape[a] for a in axes]))
        if n > 1 and x.shape[d] % n != 0:
            return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data") -> int:
    n = dp_size(mesh, axis)
    assert global_batch % n == 0, \
        f"global batch {global_batch} not divisible by {n} data-parallel ways"
    return global_batch // n


def prefetch_to_device(iterator: Any, mesh: Mesh, size: int = 2,
                       axis: str = "data"):
    """Device-prefetching iterator: keep ``size`` sharded batches in
    flight so the H2D transfer of batch k+1 overlaps the device compute
    of batch k (jax transfers are async; the classic TPU input-pipeline
    double-buffer). Yields batches in order, already sharded over
    ``axis`` — the trainer consumes this instead of calling
    :func:`shard_batch` synchronously per step."""
    from collections import deque
    buf: deque = deque()
    for batch in iterator:
        buf.append(shard_batch(batch, mesh, axis))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def host_batch_shard(mesh: Mesh, axis: str = "data") -> tuple:
    """(shard_id, num_shards) of THIS process's contiguous block of a
    batch laid out by :func:`batch_sharding` — what the DataLoader must
    feed so ``shard_batch``'s make_array_from_process_local_data sees
    exactly the rows this process's devices address.

    Derived from the sharding itself, not from process_index/count: on a
    mesh whose model (or pipeline/expert) axis crosses the process
    boundary the batch rows replicate across processes — e.g. a
    (data=1, model=8) mesh over 2 hosts needs the FULL batch on both
    hosts (returns (0, 1)), while a pure-DP 2-host mesh returns
    (process_index, 2).
    """
    if jax.process_count() == 1:
        return 0, 1
    sharding = batch_sharding(mesh, axis)
    n = dp_size(mesh, axis)  # smallest length every shard extent divides
    imap = sharding.devices_indices_map((n,))
    mine = [imap[d][0] for d in sharding.addressable_devices]
    starts = [s.start or 0 for s in mine]
    stops = [s.stop if s.stop is not None else n for s in mine]
    lo, hi = min(starts), max(stops)
    extent = hi - lo
    # contiguity holds for meshes built from the standard process-ordered
    # jax.devices() layout (create_mesh); anything else needs an explicit
    # loader sharding
    covered = np.zeros(n, bool)
    for s, e in zip(starts, stops):
        covered[s:e] = True
    assert covered[lo:hi].all() and covered.sum() == extent, \
        f"non-contiguous host batch block [{lo},{hi}) of {n}"
    assert n % extent == 0 and lo % extent == 0, \
        f"irregular host batch block [{lo},{hi}) of {n}"
    return lo // extent, n // extent


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a host pytree with the leading dim sharded over ``axis``.

    Per-host data sharding: each host feeds only its slice in multi-host
    runs (jax.device_put with NamedSharding handles the single-host case;
    multi-host feeds go through jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
