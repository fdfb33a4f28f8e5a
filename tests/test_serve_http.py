"""HTTP serving host (serve_http.py): a live loopback server over an AOT
artifact must return exactly what a direct artifact.predict call returns,
for exact, padded (ragged) and chunked batch sizes, plus the error paths.

No reference analogue: the reference's serving story is re-invoking
run_auv_inference per survey (functions/functions.py:26-82); here an
exported program becomes a long-lived network service.
"""
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.serve_http import ArtifactService, make_server
from multimodal_auv_tpu.serving import (export_predict_artifact,
                                        load_predict_artifact)

ARCH = ArchConfig.micro()
B, S, MC = 4, 32, 4
CLASSES = ["Sand", "Mud", "Rock"]


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    bundle = make_multimodal_bundle(len(CLASSES), BNNPriorSpec(),
                                    jax.random.PRNGKey(0), ARCH)
    d = str(tmp_path_factory.mktemp("artifact"))
    export_predict_artifact(bundle, d, batch_size=B, num_mc_samples=MC,
                            image_size=S, class_names=CLASSES)
    server = make_server(d, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", d
    server.shutdown()
    server.server_close()
    thread.join(timeout=10)


def _arrays(n, seed=0):
    rng = np.random.default_rng(seed)
    return {"main": rng.integers(0, 255, (n, S, S, 3), dtype=np.uint8),
            "bathy": rng.integers(0, 255, (n, S, S, 3), dtype=np.uint8),
            "sss": rng.integers(0, 255, (n, S, S, 1), dtype=np.uint8)}


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _post(url, body, path="/predict"):
    req = urllib.request.Request(url + path, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_meta(server_url):
    url, _ = server_url
    status, health = _get(url, "/healthz")
    assert status == 200 and health["status"] == "ok"
    assert health["batch_size"] == B and health["num_mc_samples"] == MC
    status, meta = _get(url, "/meta")
    assert status == 200 and meta["class_names"] == CLASSES


@pytest.mark.parametrize("n", [B, 2, 2 * B + 1])
def test_predict_matches_direct_call(server_url, n):
    """Exact (n==B), padded (n<B) and chunked (n>2B) requests must equal a
    direct ArtifactService call with the same seed — which itself is pinned
    to artifact.predict below."""
    url, d = server_url
    arrays = _arrays(n, seed=n)
    status, got = _post(url, _npz_bytes(seed=np.uint32(7), **arrays))
    assert status == 200 and got["n"] == n

    svc = ArtifactService(load_predict_artifact(d))
    want = svc.predict(arrays, n, seed=7)
    np.testing.assert_array_equal(got["predicted"],
                                  want["predicted"].astype(int))
    np.testing.assert_allclose(got["predictive_uncertainty"],
                               want["predictive_uncertainty"], rtol=1e-6)
    np.testing.assert_allclose(got["aleatoric_uncertainty"],
                               want["aleatoric_uncertainty"], rtol=1e-6)
    np.testing.assert_allclose(got["mean_prob"], want["mean_prob"],
                               atol=1e-6)
    assert got["predicted_labels"] == [CLASSES[i] for i in got["predicted"]]
    assert all(len(row) == len(CLASSES) for row in got["mean_prob"])


def test_service_padding_matches_artifact_mask(server_url):
    """The service's pad+mask rule must equal artifact.predict with an
    explicit mask (the serving-loop rule it mirrors)."""
    _, d = server_url
    art = load_predict_artifact(d)
    svc = ArtifactService(art)
    arrays = _arrays(2, seed=3)
    got = svc.predict(arrays, 2, seed=11)

    with jax.default_device(jax.devices("cpu")[0]):
        key = np.asarray(jax.random.PRNGKey(11), np.uint32)
    padded = [np.concatenate([a, np.repeat(a[-1:], B - 2, 0)])
              for a in (arrays["main"], arrays["bathy"], arrays["sss"])]
    mask = np.array([1, 1, 0, 0], np.float32)
    want = art.predict(*padded, key=key, mask=mask)
    np.testing.assert_array_equal(got["predicted"], want["predicted"][:2])
    np.testing.assert_allclose(got["mean_prob"], want["mean_prob"][:2],
                               atol=1e-7)


def test_seed_reproducible_fresh_draws_by_default(server_url):
    url, _ = server_url
    arrays = _arrays(B, seed=5)
    body = _npz_bytes(seed=np.uint32(9), **arrays)
    _, a = _post(url, body)
    _, b = _post(url, body)
    assert a["mean_prob"] == b["mean_prob"]  # same seed -> same draws
    # no seed -> fresh draws per request (the artifact's call counter)
    free = _npz_bytes(**arrays)
    _, c = _post(url, free)
    _, e = _post(url, free)
    assert c["mean_prob"] != e["mean_prob"]


@pytest.mark.parametrize("body,msg", [
    (b"not an npz", "not a readable"),
    (b"", "not a readable"),
])
def test_predict_malformed_body(server_url, body, msg):
    url, _ = server_url
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, body)
    assert ei.value.code == 400
    assert msg in json.loads(ei.value.read())["error"]


def test_predict_bad_arrays(server_url):
    url, _ = server_url
    arrays = _arrays(2)
    missing = {k: v for k, v in arrays.items() if k != "sss"}
    for bad, msg in [
        (missing, "missing required array"),
        ({**arrays, "main": arrays["main"].astype(np.float32)},
         "must be uint8"),
        ({**arrays, "bathy": arrays["bathy"][:, :8]}, "shape"),
        ({**arrays, "sss": arrays["sss"][:1]}, "row counts differ"),
        ({k: v[:0] for k, v in arrays.items()}, "empty batch"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, _npz_bytes(**bad))
        assert ei.value.code == 400, bad.keys()
        assert msg in json.loads(ei.value.read())["error"]


def test_unknown_paths(server_url):
    url, _ = server_url
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(url, "/nope")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, b"x", path="/nope")
    assert ei.value.code == 404


def test_concurrent_requests(server_url):
    """Device dispatch is lock-serialized; concurrent clients must all get
    correct, independent answers."""
    url, d = server_url
    bodies = [(n, _npz_bytes(seed=np.uint32(n), **_arrays(B, seed=n)))
              for n in range(4)]
    results = {}

    def hit(n, body):
        results[n] = _post(url, body)[1]

    threads = [threading.Thread(target=hit, args=nb) for nb in bodies]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    svc = ArtifactService(load_predict_artifact(d))
    for n, _ in bodies:
        want = svc.predict(_arrays(B, seed=n), B, seed=n)
        np.testing.assert_allclose(results[n]["mean_prob"],
                                   want["mean_prob"], atol=1e-6)
