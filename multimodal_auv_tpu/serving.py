"""AOT serving artifacts: ``jax.export`` the compiled predict program.

Production serving for the reference means re-instantiating the torch
modules, re-downloading weights, and re-tracing in every process
(/root/reference/src/Multimodal_AUV/functions/functions.py:26-82). The
TPU-native path exports the *compiled program itself*: the packed MC
predict step (uint8 batch -> fused CSV columns, engine/predict.py) is
lowered once with ``jax.export`` and written to disk next to the
posterior/BN state. A serving host then needs only this module + jax +
numpy — no flax, no model code, no tracing — and every serving process
runs the byte-identical StableHLO program.

Artifact layout (a directory):

    program.jaxexport   serialized jax.export.Exported (StableHLO)
    state.npz           posterior + BN leaves, ordered (leaf_00000, ...)
    meta.json           version, shapes, num_mc, platforms, class names

The exported callable has signature
``(state_leaves, (main_u8, bathy_u8, sss_u8), key, mask) -> outputs`` with
the state as a flat *list* of arrays, so the loader never needs the
pytree structure (it feeds the npz arrays back in index order).
"""
from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Optional, Sequence

import jax
import jax.export
import numpy as np

logger = logging.getLogger(__name__)

ARTIFACT_VERSION = 1
_PROGRAM = "program.jaxexport"
_STATE = "state.npz"
_META = "meta.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _mesh_shardings(data_shards: int, mc_shards: int = 1):
    """(replicated, batch-sharded, fused-output, mc-weight-stack)
    NamedShardings over a (data_shards, mc_shards)-device ('data', 'mc')
    mesh built from the first data*mc local devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = jax.devices()
    n = data_shards * mc_shards
    if len(devs) < n:
        raise ValueError(f"data_shards={data_shards} x mc_shards="
                         f"{mc_shards} = {n} but only {len(devs)} "
                         "devices are visible")
    mesh = Mesh(np.array(devs[:n]).reshape(data_shards, mc_shards),
                ("data", "mc"))
    repl = NamedSharding(mesh, PartitionSpec())
    batch = NamedSharding(mesh, PartitionSpec("data"))
    # fused output is (3 + C, batch): shard the batch (minor) axis
    out = NamedSharding(mesh, PartitionSpec(None, "data"))
    # the (mc_chunk, P) sampled-weight stack: draws over 'mc'
    ws = NamedSharding(mesh, PartitionSpec("mc", None))
    return repl, batch, out, ws


def export_predict_artifact(bundle, out_dir: str, *, batch_size,
                            num_mc_samples: int, image_size: int = 256,
                            mc_chunk: Optional[int] = None,
                            impl: str = "auto",
                            mode: str = "mc",
                            dvp_on_excess: str = "mc",
                            data_shards: int = 1,
                            mc_shards: int = 1,
                            platforms: Optional[Sequence[str]] = None,
                            class_names: Optional[Sequence[str]] = None,
                            fast_sampling: Optional[bool] = None,
                            bn_mode: str = "train",
                            seed: int = 0) -> str:
    """Export the packed predict step + state for ``bundle`` to ``out_dir``.

    ``platforms``: lowering targets (e.g. ``["tpu"]``); defaults to the
    current backend. ``batch_size`` is static by default (XLA programs
    have static shapes); serve ragged tails by zero-padding + the
    validity ``mask`` argument, exactly like the in-process serving loop.
    Pass ``batch_size="poly"`` for a *batch-polymorphic* artifact
    (jax.export symbolic shapes): one artifact serves any batch size, at
    the cost of one XLA specialization per distinct size seen at load
    time (standard serving bucketing) — verified bit-exact vs the static
    step at every size (tests/test_serving.py).

    ``mode="dvp"`` exports the single-pass moment-propagation step
    (engine/moment.py, ~1.7x the exact-MC serving rate) instead of exact
    MC — same artifact ABI, so the loader and serving host are unchanged.
    The DVP guardrail runs at *export* time: if the posterior spread
    exceeds the validated regime, ``dvp_on_excess`` decides (default
    ``"mc"``: the artifact silently contains the exact MC program — the
    mode actually exported is recorded in ``meta.json["mode"]``).

    ``data_shards=N`` exports a *multi-device* program: the batch (and
    mask/outputs) are sharded over an N-device ``('data',)`` mesh with the
    state replicated — XLA inserts the BN-statistics collectives. The
    serving host must have >= N devices; the loader rebuilds the mesh.
    Requires a static ``batch_size`` divisible by N. Numerics match the
    single-device program to f32 collective-reduction roundoff (~1e-7
    relative), not bitwise.

    ``mc_shards=M`` spreads the MC ENSEMBLE over an ('mc',) mesh axis —
    the BNN-specific parallelism (SURVEY §2.8): M chips each run
    num_mc/M weight draws of the SAME batch, collectives reduce the
    estimators. The low-latency multi-chip shape for small batches
    (where data-sharding has nothing to split). Composes with
    ``data_shards`` on a (data, mc) mesh; exact-MC mode only (DVP's
    trunk pass has no draw axis to shard); forces ``mc_chunk`` to a
    multiple of M (default: all draws in one sharded stack).
    """
    from multimodal_auv_tpu.engine.predict import make_packed_predict_step

    if mc_shards > 1 and mode != "mc":
        raise ValueError("mc_shards > 1 requires mode='mc' (DVP's trunk "
                         "pass has no MC-draw axis to shard)")
    if mc_shards > 1 and num_mc_samples % mc_shards:
        raise ValueError(f"num_mc_samples {num_mc_samples} must be "
                         f"divisible by mc_shards {mc_shards}")
    ws_sh = None
    if mc_shards > 1:
        if mc_chunk is None:
            mc_chunk = num_mc_samples  # one sharded stack of all draws
        if mc_chunk % mc_shards:
            raise ValueError(f"mc_chunk {mc_chunk} must be divisible by "
                             f"mc_shards {mc_shards}")
    exported_mode = mode
    spread = None
    if mode == "dvp":
        from multimodal_auv_tpu.engine.moment import (
            make_dvp_predict_step,
            posterior_spread,
        )

        spread = posterior_spread(bundle.post, bundle.meta)
        step, exported_mode = make_dvp_predict_step(
            bundle, num_mc_samples, on_excess=dvp_on_excess,
            packed_inputs=True, mc_chunk=mc_chunk, impl=impl,
            return_mode=True, spread=spread)
    elif mode == "mc":
        if mc_shards > 1:
            ws_sh = _mesh_shardings(data_shards, mc_shards)[3]
        step = make_packed_predict_step(bundle, num_mc_samples,
                                        mc_chunk=mc_chunk, impl=impl,
                                        ws_sharding=ws_sh,
                                        fast_sampling=fast_sampling,
                                        bn_mode=bn_mode)
    else:
        raise ValueError(f"mode must be 'mc' or 'dvp', got {mode!r}")
    leaves, treedef = jax.tree.flatten((bundle.post, bundle.batch_stats))

    def serve(state_leaves, u8_inputs, key, mask):
        post, batch_stats = jax.tree.unflatten(treedef, state_leaves)
        out = step(post, batch_stats, u8_inputs, key, mask)
        # ONE fused (3 + C, batch) f32 output = ONE device->host transfer
        # per batch: on a tunneled TPU every fetched array costs a full
        # round trip (~30 ms), and five separate outputs measured 13.3 vs
        # 57 patches/s. Rows: predicted, predictive_u, aleatoric_u, then
        # mean_prob transposed; the loader unpacks client-side.
        import jax.numpy as jnp

        return jnp.concatenate(
            [out["csv_cols"],
             out["mean_prob"].astype(jnp.float32).T], axis=0)

    s = int(image_size)
    if batch_size == "poly":
        if data_shards > 1 or mc_shards > 1:
            raise ValueError("sharded export requires a static batch_size "
                             "(the per-device shard shape must be static)")
        b, = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)

    state_sh = batch_sh = out_sh = None
    if data_shards > 1 or mc_shards > 1:
        if b % data_shards:
            raise ValueError(f"batch_size {b} must be divisible by "
                             f"data_shards {data_shards}")
        state_sh, batch_sh, out_sh, _ = _mesh_shardings(data_shards,
                                                        mc_shards)

    def spec(shape, dtype, sharding):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    state_specs = [spec(np.shape(l), l.dtype, state_sh) for l in leaves]
    u8_specs = (spec((b, s, s, 3), np.uint8, batch_sh),
                spec((b, s, s, 3), np.uint8, batch_sh),
                spec((b, s, s, 1), np.uint8, batch_sh))
    key_spec = spec(np.shape(jax.random.PRNGKey(0)), np.uint32, state_sh)
    mask_spec = spec((b,), np.float32, batch_sh)

    jit_kwargs = {}
    if data_shards > 1 or mc_shards > 1:
        jit_kwargs = dict(
            in_shardings=([state_sh] * len(leaves), (batch_sh,) * 3,
                          state_sh, batch_sh),
            out_shardings=out_sh)
    exported = jax.export.export(
        jax.jit(serve, **jit_kwargs),
        platforms=list(platforms) if platforms else None,
    )(state_specs, u8_specs, key_spec, mask_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, _STATE),
             **{f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)})
    digests = {name: _sha256(os.path.join(out_dir, name))
               for name in (_PROGRAM, _STATE)}
    num_classes = getattr(bundle.module, "num_classes", None)
    meta = {
        "version": ARTIFACT_VERSION,
        "batch_size": ("poly" if batch_size == "poly" else int(b)),
        "image_size": s,
        "num_mc_samples": num_mc_samples,
        "num_state_leaves": len(leaves),
        "num_classes": num_classes,
        "class_names": list(class_names) if class_names else None,
        "platforms": list(exported.platforms),
        "seed": seed,
        "mode": exported_mode,
        # None = auto-resolved at trace time (engine/mc.py::_resolve_fast);
        # the flag is baked into the compiled program, so the off-switch
        # for debugging production outputs must be chosen AT EXPORT
        "fast_sampling": fast_sampling,
        # "train" = reference-faithful BN-in-train-mode inference;
        # "eval" = frozen running stats (batch-composition-independent,
        # measured +12% on v5e — a documented divergence, BENCH_NOTES.md)
        "bn_mode": bn_mode,
        "posterior_spread": (None if spread is None
                             else round(float(spread), 6)),
        "data_shards": int(data_shards),
        "mc_shards": int(mc_shards),
        "sha256": digests,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    logger.info("Exported serving artifact to %s (platforms=%s, batch=%s, "
                "mc=%d, %d state leaves)", out_dir, exported.platforms,
                batch_size, num_mc_samples, len(leaves))
    return out_dir


class ServingArtifact:
    """A loaded serving artifact: ``predict`` runs the exported program.

    Needs only jax + numpy at load time — the model classes are baked
    into the serialized StableHLO.
    """

    def __init__(self, exported, state_leaves, meta: dict, shardings=None):
        self._exported = exported
        self._leaves = state_leaves
        self.meta = meta
        b = meta["batch_size"]
        self.batch_size = b if b == "poly" else int(b)
        self.image_size = int(meta["image_size"])
        self.mode = meta.get("mode", "mc")
        self.data_shards = int(meta.get("data_shards", 1))
        self.mc_shards = int(meta.get("mc_shards", 1))
        self._num_calls = 0  # fresh-draw counter for key=None predict()
        self._base_key_np = None  # lazy cache, see _base_key()
        if self.data_shards > 1 or self.mc_shards > 1:
            # multi-device program: the ('data',) mesh is rebuilt ONCE (in
            # load(), or here for a direct construction) and the call's
            # input shardings pinned to the export-time layout (state
            # replicated, batch/mask sharded) so host numpy inputs are
            # scattered correctly — the same mesh object that placed the
            # state leaves, so no re-layout on first call
            state_sh, batch_sh = (shardings if shardings is not None
                                  else _mesh_shardings(self.data_shards,
                                                       self.mc_shards))[:2]
            self._call = jax.jit(
                exported.call,
                in_shardings=([state_sh] * len(state_leaves),
                              (batch_sh,) * 3, state_sh, batch_sh))
        else:
            self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, artifact_dir: str, *, device=None,
             verify_integrity: bool = True) -> "ServingArtifact":
        with open(os.path.join(artifact_dir, _META)) as f:
            meta = json.load(f)
        if meta.get("version") != ARTIFACT_VERSION:
            raise ValueError(
                f"serving artifact version {meta.get('version')} != "
                f"supported {ARTIFACT_VERSION}")
        if verify_integrity and meta.get("sha256"):
            # deployment integrity: a truncated rsync / bit-rotted state
            # file would otherwise serve silently-wrong predictions (the
            # program would still run — npz is forgiving about trailing
            # corruption within a member)
            for name, want in meta["sha256"].items():
                got = _sha256(os.path.join(artifact_dir, name))
                if got != want:
                    raise ValueError(
                        f"artifact integrity check failed for {name}: "
                        f"sha256 {got[:16]}... != recorded {want[:16]}... "
                        f"(re-export, or load with verify_integrity=False "
                        f"to debug)")
        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
            exported = jax.export.deserialize(f.read())
        npz = np.load(os.path.join(artifact_dir, _STATE))
        leaves = [npz[f"leaf_{i:05d}"]
                  for i in range(int(meta["num_state_leaves"]))]
        shardings = None
        if (int(meta.get("data_shards", 1)) > 1
                or int(meta.get("mc_shards", 1)) > 1):
            shardings = _mesh_shardings(int(meta.get("data_shards", 1)),
                                        int(meta.get("mc_shards", 1)))
            leaves = [jax.device_put(l, shardings[0]) for l in leaves]
        elif device is not None:
            leaves = [jax.device_put(l, device) for l in leaves]
        else:
            leaves = [jax.device_put(l) for l in leaves]
        return cls(exported, leaves, meta, shardings=shardings)

    def _validate(self, main_u8, bathy_u8, sss_u8):
        b = (np.shape(main_u8)[0] if self.batch_size == "poly"
             else self.batch_size)
        for name, a, ch in (("main", main_u8, 3), ("bathy", bathy_u8, 3),
                            ("sss", sss_u8, 1)):
            a = np.asarray(a)
            if a.shape != (b, self.image_size, self.image_size, ch):
                raise ValueError(
                    f"{name} batch shape {a.shape} != artifact's "
                    f"({b}, {self.image_size}, {self.image_size}, {ch})")
            if a.dtype != np.uint8:
                raise ValueError(f"{name} batch must be uint8, got {a.dtype}")

    def _base_key(self):
        """The export-seed PRNG key as a cached HOST numpy array.
        jax.random.PRNGKey with no device context materialises on the
        default (TPU) device, so building it per keyless call would pay a
        blocking device->host transfer per batch — the exact round trip
        the keyless paths exist to avoid (threefry is backend-independent,
        so the cpu-built key is bit-identical)."""
        if self._base_key_np is None:
            with jax.default_device(jax.devices("cpu")[0]):
                self._base_key_np = np.asarray(
                    jax.random.PRNGKey(int(self.meta.get("seed", 0))),
                    np.uint32)
        return self._base_key_np

    def _dispatch(self, main_u8, bathy_u8, sss_u8, key, mask):
        """Run one batch, returning the device-resident fused output
        (3 + C, batch) — no host fetch."""
        self._validate(main_u8, bathy_u8, sss_u8)
        if key is None:
            # Fresh MC draws per call: fold a per-artifact call counter into
            # the base key (on the host cpu backend — a device fold_in would
            # block on a per-batch key fetch, see predict_batches). Reusing
            # one key verbatim would score every batch of a survey with the
            # SAME weight samples — fixed-ensemble semantics with correlated
            # errors. Pass an explicit key for reproducibility.
            with jax.default_device(jax.devices("cpu")[0]):
                key = np.asarray(jax.random.fold_in(
                    self._base_key(), self._num_calls), np.uint32)
            self._num_calls += 1
        if mask is None:
            mask = np.ones((np.shape(main_u8)[0],), np.float32)
        if not isinstance(key, jax.Array):
            # host keys pass through untouched; np.asarray on a DEVICE key
            # would block on a device->host round trip per batch (measured
            # 19.6 -> 25.8 p/s through a tunneled TPU just from this)
            key = np.asarray(key, np.uint32)
        return self._call(self._leaves,
                          (np.asarray(main_u8), np.asarray(bathy_u8),
                           np.asarray(sss_u8)),
                          key,
                          np.asarray(mask, np.float32))

    @staticmethod
    def _unpack(fused) -> dict:
        """One D2H fetch, then client-side unpacking of the fused rows."""
        f = np.asarray(fused)
        return {
            "predicted": f[0].astype(np.int32),
            "predictive_uncertainty": f[1],
            "aleatoric_uncertainty": f[2],
            "mean_prob": f[3:].T,
            "csv_cols": f[:3],
        }

    def predict(self, main_u8, bathy_u8, sss_u8, *, key=None, mask=None):
        """Run one batch. Inputs are uint8 NHWC host arrays of the
        artifact's batch size (zero-pad + mask a ragged tail; any size if
        the artifact was exported batch-polymorphic). Returns a dict of
        numpy arrays (predicted class, both uncertainties, mean softmax,
        fused csv_cols), fetched in a single device->host transfer.
        With ``key=None`` each call folds a per-artifact counter into the
        export seed, so repeated calls draw fresh MC weight samples (call
        i matches ``predict_batches``'s batch i); pass an explicit key to
        reproduce a specific draw."""
        return self._unpack(self._dispatch(main_u8, bathy_u8, sss_u8,
                                           key, mask))

    def predict_async(self, main_u8, bathy_u8, sss_u8, *, key=None,
                      mask=None):
        """Dispatch one batch WITHOUT blocking on the result: returns an
        opaque handle of device arrays; pass it to ``fetch``. Lets a
        multi-threaded host (serve_http.py) hold its device-serialization
        lock only for the enqueue, so request k+1's compute overlaps
        request k's device->host copy — the same pipelining
        ``predict_batches`` does for a single stream."""
        return self._dispatch(main_u8, bathy_u8, sss_u8, key, mask)

    def fetch(self, handle):
        """Block on a ``predict_async`` handle; one fused device->host
        transfer, same dict as ``predict``."""
        return self._unpack(handle)

    def predict_batches(self, batches, *, key=None):
        """Serve a stream: iterate ``(main_u8, bathy_u8, sss_u8)`` or
        ``(main_u8, bathy_u8, sss_u8, mask)`` tuples, yielding one output
        dict (numpy) per batch *in order*, with a one-batch-lagged result
        fetch: batch k+1 is dispatched before batch k's device->host copy,
        so the round trip overlaps device compute — the production loop
        shape of engine/predict.py. Each batch gets a distinct PRNG
        subkey (fold_in of ``key``), computed on the HOST cpu backend —
        folding on the device would cost a blocking device->host key
        fetch per batch that breaks the dispatch/fetch overlap (measured
        21.8 vs 54+ p/s through a tunneled TPU; BENCH_NOTES.md)."""
        if key is None:
            key = self._base_key()
        key = np.asarray(key, np.uint32)  # one sync, before the loop
        cpu = jax.devices("cpu")[0]
        prev = None
        for i, batch in enumerate(batches):
            mask = batch[3] if len(batch) == 4 else None
            with jax.default_device(cpu):
                # threefry fold_in is backend-independent: bit-identical
                # to a device-side fold_in of the same key
                k = np.asarray(jax.random.fold_in(key, i), np.uint32)
            out = self._dispatch(batch[0], batch[1], batch[2], k, mask)
            if prev is not None:
                yield self._unpack(prev)
            prev = out
        if prev is not None:
            yield self._unpack(prev)


def load_predict_artifact(artifact_dir: str, *, device=None) -> ServingArtifact:
    return ServingArtifact.load(artifact_dir, device=device)
