"""Packed Gaussian variational posterior — the TPU-native ``dnn_to_bnn``.

The reference relies on ``bayesian_torch.dnn_to_bnn`` to rewrite every
``nn.Conv2d``/``nn.Linear`` into a Reparameterization layer whose weight is
sampled fresh each forward, with MOPED initialisation and a per-layer KL
accumulated during the forward pass (see SURVEY.md §2.1 and
/root/reference/src/Multimodal_AUV/models/model_utils.py:26-35).

Here the same semantics are restructured for the TPU:

* All variational parameters (every Conv/Dense ``kernel`` and ``bias`` in the
  flax param tree; BatchNorm stays deterministic, matching dnn_to_bnn's
  layer selection) are **packed into two flat f32 arrays** ``mu`` and
  ``rho`` of identical length.
* One fused kernel (Pallas on TPU, jnp elsewhere) samples *all* weights of a
  Monte-Carlo draw in a single pass: ``w = mu + softplus(rho) * eps``.
* The KL against the N(prior_mu, prior_sigma²) prior is one closed-form
  elementwise expression + reduction over the packed arrays — no per-layer
  bookkeeping, identical value to bayesian-torch's accumulated sum.
* Unpacking a sampled flat vector back into the flax param tree is a list of
  *static* slices + reshapes that XLA fuses into the consumers.
* The flat layout makes FSDP-style sharding over a mesh axis a trivial 1-D
  partition (see parallel/sharding.py).

Padding: the packed arrays are padded to ``pad_multiple`` with
(mu=prior_mu, rho=softplus_inv(prior_sigma)) so that the pad region
contributes *exactly zero* KL and needs no masking.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial as _partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multimodal_auv_tpu.config import BNNPriorSpec

Params = Dict[str, Any]


@struct.dataclass
class PackedPosterior:
    """The learnable state of a Bayesian model: packed (mu, rho) plus the
    deterministic remainder of the param tree (BatchNorm scales/biases...).

    ``det`` has the full structure of the original param tree with
    variational leaves replaced by ``None`` placeholders (kept as leaves of
    an inner pytree would break optax, so they are pruned — see
    ``PackMeta.unpack``)."""

    mu: jax.Array
    rho: jax.Array
    det: Any


@dataclass(frozen=True)
class PackEntry:
    path: Tuple[str, ...]
    shape: Tuple[int, ...]
    offset: int
    size: int


@dataclass(frozen=True)
class PackMeta:
    """Static (non-pytree) description of the packing layout."""

    entries: Tuple[PackEntry, ...]
    n_real: int
    n_padded: int

    # ---- tree helpers -----------------------------------------------------

    def unpack(self, w_flat: jax.Array, det: Any) -> Params:
        """Rebuild the full flax param tree from a flat weight vector and the
        deterministic leaves. Slices are static, so XLA sees pure views.

        Differentiable with a custom VJP: the autodiff transpose of a slice
        is pad-to-P + add, so the default backward materialises one full
        P-sized pad per variational leaf (~60 x 293 MB of HBM writes per MC
        draw — measured 26 ms/draw, a quarter of the whole train step on
        v5e). The entries tile [0, n_real) contiguously in order, so the
        exact transpose is a single concatenation of the leaf cotangents."""
        return _unpack_vjp(self, w_flat, det)

    def _unpack_impl(self, w_flat: jax.Array, det: Any) -> Params:
        params = _clone_structure(det)
        for e in self.entries:
            leaf = jax.lax.slice(w_flat, (e.offset,), (e.offset + e.size,))
            _set_path(params, e.path, leaf.reshape(e.shape))
        return params

    def pack_tree(self, params: Params, *, pad_value: float = 0.0
                  ) -> jax.Array:
        """Inverse of unpack for the variational leaves.

        ``pad_value`` fills the [n_real, n_padded) alignment tail. When
        rebuilding a POSTERIOR array, pass ``spec.prior_mu`` (for mu) or
        ``softplus_inv(spec.prior_sigma)`` (for rho) — the zero-KL /
        zero-noise pad invariant (module docstring) holds only with the
        prior pad values; a zero pad would contribute spurious KL
        (sigma=softplus(0)=0.693 vs prior 1.0 is ~0.107 nats/element) and
        sample nonzero pad noise. The default 0.0 is only safe for
        non-posterior payloads (e.g. gradients, masks)."""
        parts = []
        for e in self.entries:
            leaf = _get_path(params, e.path)
            if tuple(leaf.shape) != e.shape:
                raise ValueError(f"shape mismatch at {e.path}: {leaf.shape} vs {e.shape}")
            parts.append(jnp.ravel(leaf))
        flat = jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)
        pad = self.n_padded - self.n_real
        if pad:
            flat = jnp.concatenate([flat,
                                    jnp.full((pad,), pad_value, flat.dtype)])
        return flat


# ---------------------------------------------------------------------------
# tree utilities (flax params are plain nested dicts)
# ---------------------------------------------------------------------------

_MISSING = object()


def _clone_structure(tree):
    if isinstance(tree, dict):
        return {k: _clone_structure(v) for k, v in tree.items()}
    return tree


def _set_path(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: Dict, path: Tuple[str, ...], *, default=_MISSING):
    """Walk ``path`` through nested dicts. Raises KeyError on a missing
    segment unless ``default`` is given (tolerant mode, used by the torch
    importer where unknown keys are expected and dropped)."""
    node = tree
    for p in path:
        if default is not _MISSING and (not isinstance(node, dict)
                                        or p not in node):
            return default
        node = node[p]
    return node


def iter_variational_paths(params: Params):
    """Yield (path, leaf) for every variational leaf, in deterministic
    (sorted) order.

    Selection rule — the functional analogue of dnn_to_bnn's "replace every
    Conv2d/Linear/LSTM" walk: a param group that owns a ``kernel`` entry is a
    Conv/Dense module, so its ``kernel`` and ``bias`` become variational;
    groups with ``scale`` (BatchNorm/LayerNorm) stay deterministic."""

    def rec(node, path):
        if not isinstance(node, dict):
            return
        keys = sorted(node.keys())
        if "kernel" in node and not isinstance(node["kernel"], dict):
            for k in keys:
                if k in ("kernel", "bias") and not isinstance(node[k], dict):
                    yield path + (k,), node[k]
            # descend into any nested submodules that coexist (unusual)
            for k in keys:
                if isinstance(node[k], dict):
                    yield from rec(node[k], path + (k,))
        else:
            for k in keys:
                if isinstance(node[k], dict):
                    yield from rec(node[k], path + (k,))

    yield from rec(params, ())


def softplus_inv(y: float) -> float:
    """rho such that softplus(rho) == y."""
    return float(np.log(np.expm1(y)))


# ---------------------------------------------------------------------------
# bayesianize
# ---------------------------------------------------------------------------

def bayesianize(
    params: Params,
    spec: BNNPriorSpec,
    *,
    rng: Optional[jax.Array] = None,
    pad_multiple: int = 1024,
) -> Tuple[PackedPosterior, PackMeta]:
    """Convert a deterministic flax param tree into a PackedPosterior.

    MOPED (`moped_enable`, /root/reference/main.py:282-283): posterior mean
    initialised from the deterministic weights, sigma = moped_delta * |w|
    (so rho = softplus_inv(moped_delta * |w|), clamped away from -inf for
    exactly-zero weights — a deliberate fix over bayesian-torch, which
    produces -inf there).

    Without MOPED, bayesian-torch draws BOTH parameters with noise:
    mu ~ N(posterior_mu_init, 0.1) and rho ~ N(posterior_rho_init, 0.1)
    (its layers' init_parameters call .normal_(init, std=0.1) on each);
    the same is done here (requires ``rng``). Note every reference config
    enables MOPED (cli.py:126), so this path is parity-matched to the
    library, not to a reference run.
    """
    entries: List[PackEntry] = []
    mu_parts: List[np.ndarray | jax.Array] = []
    rho_parts: List[np.ndarray | jax.Array] = []
    det = _clone_structure(params)

    offset = 0
    var_paths = list(iter_variational_paths(params))
    if not spec.moped_enable and rng is None:
        rng = jax.random.PRNGKey(0)

    for i, (path, leaf) in enumerate(var_paths):
        leaf = jnp.asarray(leaf, jnp.float32)
        size = int(np.prod(leaf.shape)) if leaf.ndim else 1
        entries.append(PackEntry(path, tuple(leaf.shape), offset, size))
        offset += size
        flat = jnp.ravel(leaf)
        if spec.moped_enable:
            mu_parts.append(flat)
            sigma = jnp.maximum(spec.moped_delta * jnp.abs(flat), 1e-12)
            rho_parts.append(jnp.log(jnp.expm1(sigma)))
        else:
            k = jax.random.fold_in(rng, i)
            km, kr = jax.random.split(k)
            mu_parts.append(
                spec.posterior_mu_init
                + 0.1 * jax.random.normal(km, flat.shape, jnp.float32)
            )
            rho_parts.append(
                spec.posterior_rho_init
                + 0.1 * jax.random.normal(kr, flat.shape, jnp.float32)
            )
        _set_path(det, path, None)

    n_real = offset
    n_padded = int(math.ceil(max(n_real, 1) / pad_multiple) * pad_multiple)
    pad = n_padded - n_real
    if pad:
        mu_parts.append(jnp.full((pad,), spec.prior_mu, jnp.float32))
        rho_parts.append(jnp.full((pad,), softplus_inv(spec.prior_sigma), jnp.float32))

    # Prune None placeholders so `det` is a clean pytree for optax/orbax.
    det = prune_none(det)

    mu = jnp.concatenate(mu_parts)
    rho = jnp.concatenate(rho_parts)
    post = PackedPosterior(mu=mu, rho=rho, det=det)
    meta = PackMeta(entries=tuple(entries), n_real=n_real, n_padded=n_padded)
    return post, meta


def prune_none(tree):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                pruned = prune_none(v)
                if pruned:
                    out[k] = pruned
            elif v is not None:
                out[k] = v
        return out
    return tree


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _unpack_vjp(meta: "PackMeta", w_flat: jax.Array, det: Any) -> Params:
    return meta._unpack_impl(w_flat, det)


def _unpack_fwd(meta, w_flat, det):
    # residual: a zero-length array carrying w_flat's dtype (residuals must
    # be arrays; the cotangent below is cast back to it).
    return meta._unpack_impl(w_flat, det), jnp.zeros((0,), w_flat.dtype)


def _unpack_bwd(meta, res, g):
    """Exact transpose of unpack. The entries cover [0, n_real) contiguously
    in order (pack_posterior assigns offsets cumulatively), so d(w_flat) is
    the concatenation of the raveled per-entry cotangents — ONE P-sized
    write instead of one P-sized pad+add per leaf. d(det) is the cotangent
    tree with the entry paths removed (det's exact structure, built by the
    same prune used in pack_posterior)."""
    dtype = res.dtype
    parts = [jnp.ravel(_get_path(g, e.path)).astype(dtype)
             for e in meta.entries]
    flat = jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)
    pad = meta.n_padded - meta.n_real
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), dtype)])
    g_det = _clone_structure(g)
    for e in meta.entries:
        _set_path(g_det, e.path, None)
    return flat, prune_none(g_det)


_unpack_vjp.defvjp(_unpack_fwd, _unpack_bwd)


# ---------------------------------------------------------------------------
# sampling & KL
# ---------------------------------------------------------------------------

def sigma_of(rho: jax.Array) -> jax.Array:
    return jax.nn.softplus(rho)


def sample_weights(
    post: PackedPosterior,
    key: jax.Array,
    *,
    impl: str = "auto",
) -> jax.Array:
    """One Monte-Carlo weight draw: ``w = mu + softplus(rho) * eps``.

    This is the hot op of BNN inference (replaces bayesian-torch's per-layer
    re-sampling inside every forward, /root/reference/src — SURVEY.md §3.5).
    On TPU it runs as one fused Pallas kernel with on-chip PRNG; elsewhere it
    falls back to pure jnp.
    """
    from multimodal_auv_tpu.ops.sampling import gaussian_reparam

    return gaussian_reparam(post.mu, post.rho, key, impl=impl)


def kl_divergence(post: PackedPosterior, spec: BNNPriorSpec) -> jax.Array:
    """Closed-form KL(q || prior), summed over all variational parameters.

    Matches the sum of per-layer KLs that ``bayesian_torch.get_kl_loss``
    accumulates during a forward pass (/root/reference/src/Multimodal_AUV/
    train/multimodal.py:114) — but is a pure function of (mu, rho), so it is
    computed once per step instead of once per MC draw. (In the reference the
    per-draw KL values are identical anyway: the KL does not depend on the
    sampled eps.) The pad region contributes exactly 0 by construction.
    """
    sigma = sigma_of(post.rho)
    ps = jnp.asarray(spec.prior_sigma, post.mu.dtype)
    pm = jnp.asarray(spec.prior_mu, post.mu.dtype)
    kl = (
        jnp.log(ps)
        - jnp.log(sigma)
        + (sigma**2 + (post.mu - pm) ** 2) / (2.0 * ps**2)
        - 0.5
    )
    return jnp.sum(kl)


def mean_params(post: PackedPosterior, meta: PackMeta) -> Params:
    """Deterministic parameters at the posterior mean (no sampling)."""
    return meta.unpack(post.mu, post.det)
