"""Device mesh + sharding rules: the TPU-native distributed runtime.

Replaces the reference's NCCL/DDP stack (tools/distributed.py:105-183,
tools/optims.py:52-57) with a single jax.sharding.Mesh over ICI/DCN:
  - axis 'data'  — batch (episodes) sharding; gradient psum over ICI is
    inserted by XLA from the shardings (DDP all-reduce equivalent);
  - axis 'model' — megatron-style tensor parallelism for the 7B LLM
    (attention heads / MLP hidden), optional: tp_size=1 replicates.

No process groups, no rendezvous: multihost jax initializes the global
mesh from jax.devices(); the task-id broadcast the reference does with
dist.broadcast (tasks/loaders.py:176-180) becomes a shared-seed host RNG
(see data/loaders.py MetaLoader, loaders.py:72-97).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshPlan:
    mesh: Mesh
    dp_size: int
    tp_size: int

    @property
    def num_devices(self) -> int:
        return self.dp_size * self.tp_size

    def data_sharding(self, *batch_axes) -> NamedSharding:
        """Sharding for a batch array: leading axis over 'data'."""
        return NamedSharding(self.mesh, P("data", *batch_axes))

    def named(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, (n, tp_size)
        dp_size = n // tp_size
    assert dp_size * tp_size <= n, (dp_size, tp_size, n)
    grid = np.asarray(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    mesh = Mesh(grid, axis_names=("data", "model"))
    return MeshPlan(mesh=mesh, dp_size=dp_size, tp_size=tp_size)


def replicated(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P())


def shard_params(params: Dict[str, Any], specs: Dict[str, Any],
                 plan: MeshPlan) -> Dict[str, Any]:
    """Place a param pytree on the mesh. `specs` mirrors the tree with
    PartitionSpec leaves; missing subtrees replicate."""

    def place(path, leaf):
        spec = specs
        try:
            for k in path:
                spec = spec[k.key] if hasattr(k, "key") else spec[k.idx]
        except (KeyError, TypeError, IndexError):
            spec = P()
        if not isinstance(spec, P):
            spec = P()
        if (path and getattr(path[-1], "key", None) == "q4p"
                and len(spec) == getattr(leaf, "ndim", 0)
                and spec[-1] is not None):
            # int4 nibble-packed weights: the packed last axis is o/2
            # channel PAIRS; a TP split must land on pair boundaries or
            # channels silently mis-map to the wrong scale groups
            names = ((spec[-1],) if isinstance(spec[-1], str)
                     else tuple(spec[-1]))
            deg = 1
            for nme in names:
                deg *= plan.mesh.shape[nme]
            assert leaf.shape[-1] % deg == 0, (
                f"q4p leaf last axis {leaf.shape[-1]} (= out_channels/2) "
                f"must divide by model degree {deg}: per-shard output-"
                f"channel count would be odd, splitting a nibble pair "
                f"across TP shards")
        return jax.device_put(leaf, NamedSharding(plan.mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def zero1_shard_opt_state(opt_state, plan: MeshPlan,
                          min_size: int = 1 << 16):
    """ZeRO-1 optimizer-state sharding (Rajbhandari et al. 2019): every
    large optimizer-state leaf gains a 'data'-axis shard on its first
    unsharded dp-divisible axis, on TOP of whatever 'model' sharding it
    inherited from its parameter at tx.init. Params and grads stay
    dp-replicated (plain DDP semantics, loss-equal); only the Adam
    m/v moments — 2x the param bytes, the largest training-state
    tensor — split dp ways. XLA then computes each update shard locally
    and all-gathers the applied updates (the pinned out_shardings in
    make_opt_step force that schedule), which is the same per-step
    'data'-axis traffic DDP's gradient all-reduce already pays.

    At 7B / dp=4 x tp=2 this is what makes the training state fit a
    v5e-8: moments drop 27 GB replicated -> ~3.4 GB per chip.

    Small leaves (step counters, scalar schedules) replicate on the
    mesh — they must still move to a mesh-wide sharding so the jitted
    opt_step has one consistent device set."""
    if plan is None or plan.dp_size <= 1:
        return opt_state

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = [None] * x.ndim
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh.shape == plan.mesh.shape:
            spec = list(s.spec) + [None] * (x.ndim - len(s.spec))
        if x.size >= min_size:
            for i, (name, dim) in enumerate(zip(spec, x.shape)):
                if name is None and dim % plan.dp_size == 0 and dim > 1:
                    spec[i] = "data"
                    break
        return jax.device_put(x, NamedSharding(plan.mesh, P(*spec)))

    return jax.tree.map(place, opt_state)


def nav_param_specs(nav_cfg, quantized: bool = False,
                    bits: int = 8) -> Dict[str, Any]:
    """PartitionSpecs for the full NavModel param tree: LLM sharded per
    llama.partition_specs, pano encoder + heads replicated (they are
    <1% of the params; replication avoids tiny-matmul collectives).

    quantized=True mirrors the int8 {"q","s"} structure so TP still
    splits the int8 tensors over the model axis — without it the spec
    lookup misses and the whole quantized LLM replicates, forfeiting
    the TP memory win (models/quant.py)."""
    from ..models import llama as L
    return {"llm": L.partition_specs(nav_cfg.llm, quantized=quantized,
                                     bits=bits)}
