"""Typed configuration tree for the whole framework.

The reference passes loose dicts around (``const_bnn_prior_parameters``,
``optimizer_params``, ``scheduler_params``, ``training_params`` — canonical
values at /root/reference/main.py:276-317 and config.yaml). Here the same
knobs (same names) live in dataclasses that are YAML-loadable and
CLI-overridable.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class BNNPriorSpec:
    """Variational/prior parameters.

    Field names mirror the reference's ``const_bnn_prior_parameters``
    (/root/reference/main.py:276-284): a unit Gaussian prior, a
    Reparameterization posterior, and MOPED initialisation (posterior mean
    = pretrained weight, sigma = moped_delta * |w|).
    """

    prior_mu: float = 0.0
    prior_sigma: float = 1.0
    posterior_mu_init: float = 0.0
    posterior_rho_init: float = -3.0
    type: str = "Reparameterization"
    moped_enable: bool = True
    moped_delta: float = 0.1

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BNNPriorSpec":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class OptimizerSpec:
    """Adam hyperparameters per model (reference: train/loop_utils.py:13-63)."""

    lr: float = 1e-5
    weight_decay: float = 1e-5


@dataclass(frozen=True)
class SchedulerSpec:
    """StepLR hyperparameters (reference: train/loop_utils.py:13-63)."""

    step_size: int = 7
    gamma: float = 0.752


@dataclass(frozen=True)
class TrainingSpec:
    num_epochs: int = 20
    num_mc: int = 12
    batch_size: int = 12
    # Chunk size for on-chip MC scan-of-vmap (purely a memory/perf knob;
    # results are invariant to it).
    mc_chunk: int = 1
    # Reference quirk: the multimodal epoch loop steps the LR scheduler
    # twice per epoch (train/loop_utils.py:233,246). Kept for parity,
    # switchable.
    double_scheduler_step: bool = True


@dataclass(frozen=True)
class MeshSpec:
    """Device-mesh layout: `data` axis for batch DP / FSDP param sharding,
    `mc` axis for Monte-Carlo ensemble parallelism (unique to BNNs —
    see SURVEY.md §2.8)."""

    data: int = 1
    mc: int = 1
    # Shard the packed posterior FSDP-style over the `data` axis.
    fsdp: bool = False


@dataclass(frozen=True)
class DistSpec:
    """Multi-host launch spec — the production wiring for the reference's
    dormant DDP path (train/multimodal.py:109-110, SURVEY.md §2.8). Every
    host runs the SAME pipeline command with its own ``process_id``; the
    pipelines call ``jax.distributed.initialize`` before any device query,
    build the mesh over the GLOBAL device set, feed per-host batch slices
    (data/loaders.py::HostShardLoader), and gate CSV/TB/manifest writers
    on process 0. ``from_env`` reads AUV_COORDINATOR / AUV_NUM_PROCESSES /
    AUV_PROCESS_ID so fleet launchers can inject the topology without
    flag plumbing."""

    coordinator: Optional[str] = None
    num_processes: int = 1
    process_id: Optional[int] = None
    initialization_timeout: int = 300

    @classmethod
    def from_env(cls) -> Optional["DistSpec"]:
        import os

        coord = os.environ.get("AUV_COORDINATOR")
        nproc = os.environ.get("AUV_NUM_PROCESSES")
        if not coord or not nproc or int(nproc) <= 1:
            return None
        pid = os.environ.get("AUV_PROCESS_ID")
        return cls(coordinator=coord, num_processes=int(nproc),
                   process_id=int(pid) if pid is not None else None)


@dataclass(frozen=True)
class RunConfig:
    num_classes: int = 7
    bnn: BNNPriorSpec = field(default_factory=BNNPriorSpec)
    training: TrainingSpec = field(default_factory=TrainingSpec)
    optimizer: OptimizerSpec = field(default_factory=OptimizerSpec)
    scheduler: SchedulerSpec = field(default_factory=SchedulerSpec)
    mesh: MeshSpec = field(default_factory=MeshSpec)
    bathy_patch_type: Optional[str] = "patch_30_bathy"
    sss_patch_type: Optional[str] = "patch_30_sss"


def load_yaml(path: str) -> RunConfig:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    def build(cls, d):
        names = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in (d or {}).items():
            if k not in names:
                # loud, not silent: a typo'd section/field ('trainng:',
                # 'num_epoch:') would otherwise yield an all-default run
                # with no signal that the knob was ignored
                import logging

                logging.getLogger(__name__).warning(
                    "config %s: unknown key %r (not a %s field) — ignored",
                    path, k, cls.__name__)
                continue
            sub = {"bnn": BNNPriorSpec, "training": TrainingSpec,
                   "optimizer": OptimizerSpec, "scheduler": SchedulerSpec,
                   "mesh": MeshSpec}.get(k)
            kwargs[k] = build(sub, v) if sub else v
        return cls(**kwargs)

    return build(RunConfig, raw)


# The canonical 7 benthic habitat classes of the pretrained model
# (/root/reference/README.md:70-71).
HABITAT_CLASSES = (
    "Sand", "Mud", "Rock", "Gravel", "Burrowed Mud", "Kelp forest",
    "Horse Mussel reef",
)

# Per-channel optical normalisation constants
# (/root/reference/src/Multimodal_AUV/data/datasets.py:246-249).
OPTICAL_MEAN = (62.19902423 / 255.0, 62.31835042 / 255.0, 61.53444229 / 255.0)
OPTICAL_STD = (41.46890313 / 255.0, 43.39430715 / 255.0, 41.72083641 / 255.0)

IMAGE_SIZE = 256
