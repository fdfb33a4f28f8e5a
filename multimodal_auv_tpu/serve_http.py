"""HTTP serving host for AOT predict artifacts.

The reference's production story ends at a Python function call —
``run_auv_inference`` must be re-invoked per survey, re-instantiating
models and re-tracing in every process
(/root/reference/src/Multimodal_AUV/functions/functions.py:26-82). This
module turns a serving artifact (serving.py: the jax.export'ed StableHLO
predict program + state) into a long-lived network service with nothing
but the standard library: a ``ThreadingHTTPServer`` exposing

    GET  /healthz    liveness + artifact summary (also warms the program)
    GET  /meta       the artifact's meta.json (batch size, mc, classes...)
    POST /predict    one batch -> JSON predictions + uncertainties

``/predict`` accepts an ``.npz`` body (``numpy.savez`` of uint8 NHWC
arrays ``main``, ``bathy``, ``sss`` — the exact arrays the packed loader
produces) and returns the reference CSV schema as JSON: predicted class,
predictive (variance-family) and aleatoric uncertainty per row, plus the
mean softmax. Any row count is accepted: requests smaller than the
artifact's static batch are padded + masked (the in-process serving
loop's rule, engine/predict.py), larger ones are chunked sequentially.
Device dispatch is serialized with a lock — one program, one chip;
HTTP I/O and npz decode overlap across threads.

PRNG semantics match ``ServingArtifact.predict``: by default every
request draws fresh MC weight samples (a per-artifact counter folded
into the export seed); a client needing reproducibility sends an
explicit ``seed`` (uint32 scalar) in the npz and gets the same draws
for the same seed, independent of request order.

Run:  multimodal-auv-serve --artifact DIR [--host H] [--port P]
Test: tests/test_serve_http.py drives a live server over a loopback
socket and pins every response field to a direct artifact.predict call.
"""
from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger(__name__)

_MODALITIES = (("main", 3), ("bathy", 3), ("sss", 1))


class ArtifactService:
    """Request-shape handling around one loaded ``ServingArtifact``:
    pad+mask short batches, chunk long ones, serialize device calls."""

    def __init__(self, artifact):
        self.artifact = artifact
        self._lock = threading.Lock()

    # -- helpers -----------------------------------------------------------

    def _parse_npz(self, body: bytes):
        try:
            npz = np.load(io.BytesIO(body), allow_pickle=False)
        except Exception as e:
            raise ValueError(f"body is not a readable .npz: {e}") from e
        arrays = {}
        s = self.artifact.image_size
        n = None
        for name, ch in _MODALITIES:
            if name not in npz:
                raise ValueError(f"npz missing required array {name!r} "
                                 f"(need {[m for m, _ in _MODALITIES]})")
            a = npz[name]
            if a.dtype != np.uint8:
                raise ValueError(f"{name} must be uint8, got {a.dtype}")
            if a.ndim != 4 or a.shape[1:] != (s, s, ch):
                raise ValueError(
                    f"{name} shape {a.shape} != (n, {s}, {s}, {ch})")
            if n is None:
                n = a.shape[0]
            elif a.shape[0] != n:
                raise ValueError("main/bathy/sss row counts differ")
            arrays[name] = a
        if n == 0:
            raise ValueError("empty batch")
        seed = None
        if "seed" in npz:
            seed = int(np.asarray(npz["seed"]).reshape(()))
        return arrays, n, seed

    def _key_for(self, seed, chunk_index: int):
        """Per-chunk PRNG key. With an explicit seed the draws are a pure
        function of (seed, chunk_index); without one the artifact's
        fresh-draw counter applies (key=None)."""
        if seed is None:
            return None
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            key = jax.random.PRNGKey(seed)
            if chunk_index:
                key = jax.random.fold_in(key, chunk_index)
            return np.asarray(key, np.uint32)

    def predict(self, arrays, n: int, seed=None) -> dict:
        """Run ``n`` rows through the artifact, chunking/padding to its
        batch size. Returns numpy results trimmed to the real rows."""
        b = self.artifact.batch_size
        step = n if b == "poly" else int(b)
        outs = []
        for ci, lo in enumerate(range(0, n, step)):
            valid = min(step, n - lo)
            chunk = [arrays[m][lo:lo + valid] for m, _ in _MODALITIES]
            mask = None
            if valid < step:  # ragged tail: pad with the last row + mask
                pad = step - valid
                chunk = [np.concatenate([c, np.repeat(c[-1:], pad, 0)])
                         for c in chunk]
                mask = np.zeros((step,), np.float32)
                mask[:valid] = 1.0
            with self._lock:
                out = self.artifact.predict(
                    *chunk, key=self._key_for(seed, ci), mask=mask)
            outs.append({k: v[:valid] for k, v in out.items()
                         if k != "csv_cols"})
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def handle_predict(self, body: bytes) -> dict:
        arrays, n, seed = self._parse_npz(body)
        out = self.predict(arrays, n, seed)
        meta = self.artifact.meta
        names = meta.get("class_names")
        resp = {
            "n": int(n),
            "predicted": out["predicted"].astype(int).tolist(),
            "predictive_uncertainty":
                out["predictive_uncertainty"].astype(float).tolist(),
            "aleatoric_uncertainty":
                out["aleatoric_uncertainty"].astype(float).tolist(),
            "mean_prob": np.round(out["mean_prob"].astype(float),
                                  6).tolist(),
            "mode": meta.get("mode", "mc"),
        }
        if names:
            resp["predicted_labels"] = [names[i] for i in resp["predicted"]]
        return resp

    def summary(self) -> dict:
        m = self.artifact.meta
        return {"status": "ok", "mode": m.get("mode", "mc"),
                "batch_size": m.get("batch_size"),
                "image_size": m.get("image_size"),
                "num_mc_samples": m.get("num_mc_samples"),
                "num_classes": m.get("num_classes"),
                "platforms": m.get("platforms")}


class _Handler(BaseHTTPRequestHandler):
    # the service is attached to the server object by make_server()
    protocol_version = "HTTP/1.1"

    def _send(self, code: int, payload: dict):
        raw = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self):
        svc: ArtifactService = self.server.service
        if self.path.split("?")[0] == "/healthz":
            self._send(200, svc.summary())
        elif self.path.split("?")[0] == "/meta":
            self._send(200, svc.artifact.meta)
        else:
            self._send(404, {"error": f"unknown path {self.path!r}"})

    def do_POST(self):
        svc: ArtifactService = self.server.service
        if self.path.split("?")[0] != "/predict":
            self._send(404, {"error": f"unknown path {self.path!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            self._send(200, svc.handle_predict(body))
        except ValueError as e:  # malformed request
            self._send(400, {"error": str(e)})
        except Exception as e:  # pragma: no cover - server-side failure
            logger.error("predict request failed", exc_info=True)
            self._send(500, {"error": repr(e)})

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.info("%s - %s", self.address_string(), fmt % args)


def make_server(artifact_dir: str, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Load the artifact and bind the HTTP server (port 0 = ephemeral —
    the bound port is ``server.server_address[1]``). The caller runs
    ``serve_forever()`` (or a thread does; see ``main``)."""
    from multimodal_auv_tpu.serving import load_predict_artifact

    artifact = load_predict_artifact(artifact_dir)
    server = ThreadingHTTPServer((host, port), _Handler)
    server.service = ArtifactService(artifact)
    return server


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Serve an exported predict artifact over HTTP")
    p.add_argument("--artifact", required=True,
                   help="artifact directory (multimodal-auv-export-serving)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--warmup", action="store_true",
                   help="run one dummy batch before accepting requests "
                        "(first-request latency -> startup latency)")
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    # the exported StableHLO still XLA-compiles on load; cache the result
    # across server restarts (utils/devices.py)
    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    enable_compilation_cache()
    server = make_server(args.artifact, args.host, args.port)
    svc: ArtifactService = server.service
    if args.warmup:
        b = svc.artifact.batch_size
        n = 1 if b == "poly" else int(b)
        s = svc.artifact.image_size
        svc.predict({m: np.zeros((n, s, s, c), np.uint8)
                     for m, c in _MODALITIES}, n, seed=0)
        logger.info("warmup batch done")
    host, port = server.server_address[:2]
    logger.info("serving %s on http://%s:%d (mode=%s, batch=%s)",
                args.artifact, host, port, svc.artifact.mode,
                svc.artifact.batch_size)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
