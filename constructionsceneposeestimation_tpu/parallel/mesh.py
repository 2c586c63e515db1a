"""Device mesh + sharding helpers.

The reference is strictly single-process (SURVEY.md section 2.3); its TPU
replacement scales with a 1-D data mesh — per-frame independence makes datagen
embarrassingly parallel, and training uses data parallelism with optional
FSDP-style parameter sharding over the same axis. Collectives ride ICI via
XLA (psum for grads/metrics) — nothing NCCL-like to manage.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: call once per host before building the mesh.

    With no arguments JAX auto-detects the TPU pod environment (megascale /
    GKE metadata); explicit args cover manual clusters. After this,
    ``make_mesh()`` sees every chip of every host and the same jitted
    programs shard over ICI+DCN with no further code changes (per-frame
    independence means datagen never communicates; training psums gradients).
    """
    import jax.distributed

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    shape = (n,) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_fsdp(mesh: Mesh, params: Any) -> Any:
    """FSDP-style sharding tree: shard the largest axis of each >=2D param
    over the data axis when divisible; replicate the rest.

    Leaf-wise, so it applies to ANY params-shaped tree — including optimizer
    state (adamw's mu/nu mirror the param shapes and shard identically;
    scalar counts/schedule state replicate). Sharding the opt state is what
    makes FSDP actually save memory: adamw otherwise replicates 2x params
    per device."""
    n = mesh.shape[DATA_AXIS]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim < 2:
            return NamedSharding(mesh, P())
        sizes = list(x.shape)
        axis = int(np.argmax(sizes))
        if sizes[axis] % n == 0:
            spec = [None] * x.ndim
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)
