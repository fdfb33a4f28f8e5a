"""AOT serving artifact (serving.py): export -> load -> predict must be
byte-exact vs the in-process packed predict step, and the loader must not
need the model classes (only jax + numpy).

No reference analogue: the reference re-instantiates torch modules per
serving process (functions/functions.py:26-82); here the compiled program
itself ships.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.predict import make_packed_predict_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.serving import (ARTIFACT_VERSION,
                                        export_predict_artifact,
                                        load_predict_artifact)

ARCH = ArchConfig.micro()
B, S, MC = 4, 32, 4


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    d = str(tmp_path_factory.mktemp("artifact"))
    export_predict_artifact(bundle, d, batch_size=B, num_mc_samples=MC,
                            image_size=S, class_names=["a", "b", "c"])
    return d, bundle


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
            rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
            rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8))


def test_artifact_roundtrip_exact(artifact_dir):
    d, bundle = artifact_dir
    art = load_predict_artifact(d)
    m, b, s = _batch()
    key = jax.random.PRNGKey(7)
    out = art.predict(m, b, s, key=key)

    step = make_packed_predict_step(bundle, MC)
    ref = step(bundle.post, bundle.batch_stats, (m, b, s), key,
               jnp.ones((B,), jnp.float32))
    np.testing.assert_array_equal(out["predicted"],
                                  np.asarray(ref["predicted"]))
    np.testing.assert_array_equal(out["csv_cols"], np.asarray(ref["csv_cols"]))
    np.testing.assert_array_equal(out["mean_prob"],
                                  np.asarray(ref["mean_prob"]))


def test_artifact_deterministic_and_mask(artifact_dir):
    d, _ = artifact_dir
    art = load_predict_artifact(d)
    m, b, s = _batch(1)
    key = jax.random.PRNGKey(3)
    o1 = art.predict(m, b, s, key=key)
    o2 = art.predict(m, b, s, key=key)
    np.testing.assert_array_equal(o1["csv_cols"], o2["csv_cols"])
    # ragged tail: masked rows must not change real rows' outputs
    mask = np.array([1, 1, 0, 0], np.float32)
    m2, b2, s2 = (a.copy() for a in (m, b, s))
    m2[2:], b2[2:], s2[2:] = 0, 0, 0
    om = art.predict(m2, b2, s2, key=key, mask=mask)
    m3, b3, s3 = (a.copy() for a in (m, b, s))
    m3[2:], b3[2:], s3[2:] = 255, 255, 255
    om2 = art.predict(m3, b3, s3, key=key, mask=mask)
    np.testing.assert_allclose(om["mean_prob"][:2], om2["mean_prob"][:2],
                               rtol=1e-5, atol=1e-6)


def test_artifact_input_validation(artifact_dir):
    d, _ = artifact_dir
    art = load_predict_artifact(d)
    m, b, s = _batch()
    with pytest.raises(ValueError, match="batch shape"):
        art.predict(m[:2], b[:2], s[:2])
    with pytest.raises(ValueError, match="uint8"):
        art.predict(m.astype(np.float32), b, s)


def test_artifact_version_gate(artifact_dir, tmp_path):
    d, _ = artifact_dir
    import json
    import shutil
    bad = tmp_path / "bad"
    shutil.copytree(d, bad)
    meta = json.loads((bad / "meta.json").read_text())
    meta["version"] = ARTIFACT_VERSION + 1
    (bad / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="version"):
        load_predict_artifact(str(bad))


def test_predict_batches_lagged_stream(artifact_dir):
    """predict_batches must yield the same outputs, in order, as per-batch
    predict with the matching fold_in subkeys."""
    d, _ = artifact_dir
    art = load_predict_artifact(d)
    key = jax.random.PRNGKey(11)
    batches = [_batch(i) for i in range(3)]
    streamed = list(art.predict_batches(iter(batches), key=key))
    assert len(streamed) == 3
    for i, (got, b) in enumerate(zip(streamed, batches)):
        ref = art.predict(*b, key=jax.random.fold_in(key, i))
        np.testing.assert_array_equal(got["csv_cols"], ref["csv_cols"])


def test_polymorphic_batch_artifact(tmp_path):
    """batch_size='poly' exports ONE artifact that serves any batch size,
    bit-exact vs the in-process step at each size."""
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    d = str(tmp_path / "poly")
    export_predict_artifact(bundle, d, batch_size="poly", num_mc_samples=MC,
                            image_size=S)
    art = load_predict_artifact(d)
    assert art.batch_size == "poly"
    step = make_packed_predict_step(bundle, MC)
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(9)
    for b in (2, 5):
        m = rng.integers(0, 255, (b, S, S, 3), dtype=np.uint8)
        ba = rng.integers(0, 255, (b, S, S, 3), dtype=np.uint8)
        ss = rng.integers(0, 255, (b, S, S, 1), dtype=np.uint8)
        out = art.predict(m, ba, ss, key=key)
        ref = step(bundle.post, bundle.batch_stats, (m, ba, ss), key,
                   jnp.ones((b,), jnp.float32))
        np.testing.assert_array_equal(out["csv_cols"],
                                      np.asarray(ref["csv_cols"]))
        np.testing.assert_array_equal(out["mean_prob"],
                                      np.asarray(ref["mean_prob"]))


def test_dvp_artifact_mode(tmp_path):
    """mode='dvp' exports the single-pass moment-propagation program under
    the same artifact ABI, bit-exact vs the in-process DVP step; meta
    records the mode and the measured posterior spread."""
    from multimodal_auv_tpu.engine.moment import make_dvp_predict_step

    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    d = str(tmp_path / "dvp")
    export_predict_artifact(bundle, d, batch_size=B, num_mc_samples=MC,
                            image_size=S, mode="dvp")
    art = load_predict_artifact(d)
    assert art.mode == "dvp"
    assert art.meta["posterior_spread"] is not None
    m, b, s = _batch(5)
    key = jax.random.PRNGKey(3)
    out = art.predict(m, b, s, key=key)
    step = make_dvp_predict_step(bundle, MC, packed_inputs=True)
    ref = step(bundle.post, bundle.batch_stats, (m, b, s), key,
               jnp.ones((B,), jnp.float32))
    np.testing.assert_array_equal(out["csv_cols"], np.asarray(ref["csv_cols"]))
    np.testing.assert_array_equal(out["mean_prob"],
                                  np.asarray(ref["mean_prob"]))


def test_dvp_artifact_guardrail_fallback(tmp_path):
    """Export-time guardrail: a spread posterior with dvp_on_excess='mc'
    must ship the exact MC program, and meta.json must say so."""
    import json

    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    mu = np.asarray(bundle.post.mu)
    rho = np.log(np.expm1(np.maximum(0.5 * np.abs(mu), 1e-6))).astype(
        np.float32)
    bundle.post = bundle.post.replace(rho=jnp.asarray(rho))
    d = str(tmp_path / "fb")
    export_predict_artifact(bundle, d, batch_size=B, num_mc_samples=MC,
                            image_size=S, mode="dvp")
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["mode"] == "mc"
    assert meta["posterior_spread"] > 0.15
    art = load_predict_artifact(d)
    m, b, s = _batch(6)
    key = jax.random.PRNGKey(4)
    out = art.predict(m, b, s, key=key)
    step = make_packed_predict_step(bundle, MC)
    ref = step(bundle.post, bundle.batch_stats, (m, b, s), key,
               jnp.ones((B,), jnp.float32))
    np.testing.assert_array_equal(out["csv_cols"], np.asarray(ref["csv_cols"]))


def test_predict_batches_ragged_mask(artifact_dir):
    """4-tuple stream entries carry a validity mask; masked rows must not
    change the real rows' outputs (masked-BN artifact semantics)."""
    d, _ = artifact_dir
    art = load_predict_artifact(d)
    key = jax.random.PRNGKey(21)
    m, b, s = _batch(9)
    full_mask = np.ones((B,), np.float32)
    tail_mask = np.array([1, 1, 0, 0], np.float32)
    outs = list(art.predict_batches(
        [(m, b, s, full_mask), (m, b, s, tail_mask)], key=key))
    ref = art.predict(m, b, s, key=jax.random.fold_in(key, 0),
                      mask=full_mask)
    np.testing.assert_array_equal(outs[0]["csv_cols"], ref["csv_cols"])
    assert outs[1]["mean_prob"].shape == (B, 3)


def test_sharded_artifact(tmp_path):
    """data_shards=8: the exported multi-device program shards the batch
    over the ('data',) mesh and matches the single-device step to f32
    collective-reduction roundoff; predict_batches streams it unchanged."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    d = str(tmp_path / "sharded")
    export_predict_artifact(bundle, d, batch_size=8, num_mc_samples=MC,
                            image_size=S, data_shards=8)
    art = load_predict_artifact(d)
    assert art.data_shards == 8
    rng = np.random.default_rng(11)
    m = rng.integers(0, 255, (8, S, S, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (8, S, S, 3), dtype=np.uint8)
    ss = rng.integers(0, 255, (8, S, S, 1), dtype=np.uint8)
    key = jax.random.PRNGKey(5)
    out = art.predict(m, b, ss, key=key)

    step = make_packed_predict_step(bundle, MC)
    ref = step(bundle.post, bundle.batch_stats, (m, b, ss), key,
               jnp.ones((8,), jnp.float32))
    np.testing.assert_array_equal(out["predicted"],
                                  np.asarray(ref["predicted"]))
    np.testing.assert_allclose(out["mean_prob"], np.asarray(ref["mean_prob"]),
                               rtol=1e-5, atol=1e-6)

    streamed = list(art.predict_batches([(m, b, ss)], key=key))
    np.testing.assert_array_equal(
        streamed[0]["csv_cols"],
        np.asarray(art.predict(m, b, ss,
                               key=jax.random.fold_in(key, 0))["csv_cols"]))


def test_sharded_artifact_validation():
    """poly + shards and non-divisible batches are rejected at export."""
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    with pytest.raises(ValueError, match="static batch_size"):
        export_predict_artifact(bundle, "/tmp/x", batch_size="poly",
                                num_mc_samples=MC, image_size=S,
                                data_shards=2)
    with pytest.raises(ValueError, match="divisible"):
        export_predict_artifact(bundle, "/tmp/x", batch_size=3,
                                num_mc_samples=MC, image_size=S,
                                data_shards=2)


def test_export_pipeline_api(tmp_path):
    """pipelines.export_auv_serving_artifact: offline (HF_HUB_OFFLINE) +
    allow_random_init exports a loadable artifact end-to-end."""
    from multimodal_auv_tpu.pipelines import export_auv_serving_artifact

    d = str(tmp_path / "art")
    out = export_auv_serving_artifact(
        d, batch_size=B, num_mc_samples=MC, num_classes=3,
        allow_random_init=True, arch=ARCH)
    assert out == d
    art = load_predict_artifact(d)
    assert art.meta["num_classes"] == 3
    m, b, s = _batch(2)
    res = art.predict(m, b, s)
    assert res["predicted"].shape == (B,)
    assert res["csv_cols"].shape == (3, B)


def test_cli_export_serving_flag_parity():
    from multimodal_auv_tpu import cli

    captured = {}

    def fake(**kw):
        captured.update(kw)

    import multimodal_auv_tpu.pipelines as P

    orig = P.export_auv_serving_artifact
    P.export_auv_serving_artifact = fake
    try:
        rc = cli.export_serving_cli([
            "--output_dir", "/tmp/a", "--batch_size", "8",
            "--num_mc_samples", "12", "--platforms", "tpu,cpu"])
    finally:
        P.export_auv_serving_artifact = orig
    assert rc == 0
    assert captured["output_dir"] == "/tmp/a"
    assert captured["batch_size"] == 8
    assert captured["platforms"] == ["tpu", "cpu"]


def test_loader_needs_no_model_code(artifact_dir):
    """The loader path must run in a process where the model/flax modules
    were never imported — proven by a subprocess with an import tripwire."""
    d, _ = artifact_dir
    import subprocess
    import sys
    code = f"""
import builtins, sys
_real = builtins.__import__
FORBIDDEN = ("flax", "multimodal_auv_tpu.models", "multimodal_auv_tpu.engine",
             "multimodal_auv_tpu.bayes")
def guard(name, *a, **k):
    if any(name == f or name.startswith(f + ".") for f in FORBIDDEN):
        raise ImportError("forbidden in serving process: " + name)
    return _real(name, *a, **k)
builtins.__import__ = guard
sys.path.insert(0, {os.getcwd()!r})
import numpy as np
import jax
# the axon TPU plugin force-registers itself and overrides JAX_PLATFORMS;
# pin back to CPU (same dance as conftest.py) so this subprocess never
# touches the real chip
jax.config.update("jax_platforms", "cpu")
from multimodal_auv_tpu.serving import load_predict_artifact
art = load_predict_artifact({d!r})
rng = np.random.default_rng(0)
out = art.predict(rng.integers(0, 255, ({B},{S},{S},3), dtype=np.uint8),
                  rng.integers(0, 255, ({B},{S},{S},3), dtype=np.uint8),
                  rng.integers(0, 255, ({B},{S},{S},1), dtype=np.uint8))
assert out["predicted"].shape == ({B},)
print("SERVE_OK")
"""
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=cache,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "SERVE_OK" in r.stdout


def test_keyless_predict_draws_fresh_samples(artifact_dir):
    """predict(key=None) must fold a per-artifact call counter into the
    export seed: repeated keyless calls draw FRESH MC weight samples
    (reusing one key verbatim would score a whole survey with the same
    fixed ensemble — correlated errors), and call i must match
    predict_batches' batch i so the two keyless entry points agree."""
    d, _ = artifact_dir
    art = load_predict_artifact(d)
    m, b, s = _batch(5)
    o0 = art.predict(m, b, s)
    o1 = art.predict(m, b, s)
    # same inputs, fresh draws -> the MC-mean softmax must move
    assert np.abs(o0["mean_prob"] - o1["mean_prob"]).max() > 0
    # call i == fold_in(export seed, i) == keyless predict_batches batch i
    art2 = load_predict_artifact(d)
    streamed = list(art2.predict_batches(iter([(m, b, s), (m, b, s)])))
    np.testing.assert_array_equal(o0["csv_cols"], streamed[0]["csv_cols"])
    np.testing.assert_array_equal(o1["csv_cols"], streamed[1]["csv_cols"])


def test_mc_sharded_artifact(tmp_path):
    """mc_shards: the exported program spreads the MC ensemble over the
    'mc' mesh axis (the BNN-specific parallelism) — same draws, same
    estimators as the single-device step up to collective-reduction
    roundoff; composes with data_shards on a (data, mc) mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    rng = np.random.default_rng(13)
    m = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    ss = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    key = jax.random.PRNGKey(6)
    # reference: single-device, same chunking as the sharded export
    step = make_packed_predict_step(bundle, MC, mc_chunk=MC)
    ref = step(bundle.post, bundle.batch_stats, (m, b, ss), key,
               jnp.ones((B,), jnp.float32))

    def check(out):
        # SPMD is mathematically (not bitwise) equivalent: train-mode BN
        # mean-subtraction amplifies cross-device reduction-order noise
        # through the depth, and an UNTRAINED model's probs sit ~5e-3 from
        # uniform — so bound the estimators and gate argmax on a
        # confidence margin (the dryrun's rule, __graft_entry__.py). Real
        # sharding bugs (wrong collective, permuted shards) produce gross
        # divergence and still fail these bounds.
        mp_ref = np.asarray(ref["mean_prob"])
        np.testing.assert_allclose(out["mean_prob"], mp_ref, atol=2e-2)
        top2 = np.sort(mp_ref, axis=-1)
        confident = (top2[:, -1] - top2[:, -2]) > 5e-2
        np.testing.assert_array_equal(
            out["predicted"][confident],
            np.asarray(ref["predicted"])[confident])
        for k in ("predictive_uncertainty", "aleatoric_uncertainty"):
            np.testing.assert_allclose(out[k], np.asarray(ref[k]),
                                       rtol=1e-2, atol=1e-3)

    d = str(tmp_path / "mc_sharded")
    export_predict_artifact(bundle, d, batch_size=B, num_mc_samples=MC,
                            image_size=S, mc_shards=4)
    art = load_predict_artifact(d)
    assert art.mc_shards == 4 and art.data_shards == 1
    check(art.predict(m, b, ss, key=key))

    # composed (data=2, mc=2) mesh
    d2 = str(tmp_path / "dxm")
    export_predict_artifact(bundle, d2, batch_size=B, num_mc_samples=MC,
                            image_size=S, data_shards=2, mc_shards=2)
    art2 = load_predict_artifact(d2)
    assert art2.data_shards == 2 and art2.mc_shards == 2
    check(art2.predict(m, b, ss, key=key))


def test_mc_sharded_artifact_validation():
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    with pytest.raises(ValueError, match="mode='mc'"):
        export_predict_artifact(bundle, "/tmp/x", batch_size=B,
                                num_mc_samples=MC, image_size=S,
                                mode="dvp", mc_shards=2)
    with pytest.raises(ValueError, match="divisible by mc_shards"):
        export_predict_artifact(bundle, "/tmp/x", batch_size=B,
                                num_mc_samples=5, image_size=S, mc_shards=2)
    with pytest.raises(ValueError, match="static batch_size"):
        export_predict_artifact(bundle, "/tmp/x", batch_size="poly",
                                num_mc_samples=MC, image_size=S, mc_shards=2)


def test_artifact_integrity_check(tmp_path):
    """meta.json records sha256 of program+state; a corrupted state file
    must be refused at load (a truncated copy would otherwise serve
    silently-wrong predictions)."""
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ARCH)
    d = str(tmp_path / "a")
    export_predict_artifact(bundle, d, batch_size=2, num_mc_samples=2,
                            image_size=S)
    load_predict_artifact(d)  # intact: loads fine

    state = os.path.join(d, "state.npz")
    raw = bytearray(open(state, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # flip one byte mid-file
    open(state, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="integrity check failed"):
        load_predict_artifact(d)
    # explicit opt-out for debugging still loads (npz may still parse)
    from multimodal_auv_tpu.serving import ServingArtifact

    try:
        ServingArtifact.load(d, verify_integrity=False)
    except Exception as e:  # corruption may also break npz parsing itself
        assert "integrity" not in str(e)
