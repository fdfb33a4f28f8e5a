"""Export a trained posterior back to the PyTorch reference stack.

Loads a checkpoint trained here (orbax dir or torch .pth), rebuilds the
bundle, and writes either a single bayesian-torch-named .pth (consumable
by the reference's load_and_fix_state_dict / load_and_prepare_multimodal_
model, Example_Inference_model.py:82-112) or the full HF repo layout
(<out>/multimodal-bnn/pytorch_model.bin) ready for
huggingface_hub.upload_folder."""
import _bootstrap  # noqa: F401  (source-checkout sys.path setup)

import argparse

import jax

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.interop.hub import export_for_hub
from multimodal_auv_tpu.interop.torch_export import save_torch_checkpoint
from multimodal_auv_tpu.engine.checkpointing import load_and_fix_state_dict
from multimodal_auv_tpu.models.model_utils import (
    ArchConfig,
    make_multimodal_bundle,
)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir or torch .pth trained here")
    p.add_argument("--num_classes", type=int, default=7)
    p.add_argument("--out", default="export.pth",
                   help=".pth path, or a directory with --hub-layout")
    p.add_argument("--hub_layout", action="store_true",
                   help="write <out>/multimodal-bnn/pytorch_model.bin")
    p.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    a = p.parse_args()

    arch = ArchConfig.micro() if a.tiny else ArchConfig()
    bundle = make_multimodal_bundle(a.num_classes, BNNPriorSpec(),
                                    jax.random.PRNGKey(0), arch)
    if a.checkpoint.endswith((".pth", ".bin", ".pt")):
        from multimodal_auv_tpu.interop.torch_import import (
            load_and_prepare_multimodal_model,
        )

        bundle, _ = load_and_prepare_multimodal_model(
            bundle, a.checkpoint, num_classes=a.num_classes)
    else:
        post, ok = load_and_fix_state_dict(bundle.post, a.checkpoint)
        assert ok, f"could not restore {a.checkpoint}"
        bundle.post = post
    if a.hub_layout:
        path = export_for_hub(bundle, a.out)
    else:
        save_torch_checkpoint(bundle, a.out)
        path = a.out
    print(f"exported -> {path}")
