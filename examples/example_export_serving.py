"""Export an AOT serving artifact and serve a batch from it.

The export side needs the full framework; the serving side needs only
jax + numpy (serving.py) — the compiled StableHLO program ships with the
posterior state, so serving processes never trace or rebuild the model.
"""
import argparse

import numpy as np

from multimodal_auv_tpu.pipelines import export_auv_serving_artifact
from multimodal_auv_tpu.serving import load_predict_artifact


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_mc_samples", type=int, default=20)
    p.add_argument("--model_weights", default=None)
    p.add_argument("--allow_random_init", action="store_true")
    args = p.parse_args()

    export_auv_serving_artifact(
        args.output_dir, batch_size=args.batch_size,
        num_mc_samples=args.num_mc_samples,
        model_weights_path=args.model_weights,
        allow_random_init=args.allow_random_init)

    art = load_predict_artifact(args.output_dir)
    s, b = art.image_size, art.batch_size
    rng = np.random.default_rng(0)
    out = art.predict(
        rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
        rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
        rng.integers(0, 255, (b, s, s, 1), dtype=np.uint8))
    print("predicted classes:", out["predicted"])
    print("predictive uncertainty:", out["predictive_uncertainty"])


if __name__ == "__main__":
    main()
