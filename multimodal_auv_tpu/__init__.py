"""multimodal_auv_tpu — TPU-native framework for Bayesian multimodal
benthic-habitat classification from AUV survey data.

A ground-up JAX/XLA/Pallas/pjit redesign with the capabilities of the
PyTorch reference (sams-tom/Multimodal-AUV). Public pipeline API mirrors the
reference's package-level exports (/root/reference/src/Multimodal_AUV/
__init__.py:5-10).
"""

__version__ = "0.1.0"

__all__ = [
    "run_auv_inference",
    "run_auv_retraining",
    "run_auv_preprocessing",
    "run_AUV_training_from_scratch",
]


def __getattr__(name):
    # Lazy imports: keep `import multimodal_auv_tpu` light.
    if name in __all__:
        from multimodal_auv_tpu import pipelines

        return getattr(pipelines, name)
    raise AttributeError(name)
