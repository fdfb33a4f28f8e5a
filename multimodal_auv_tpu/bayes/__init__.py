from multimodal_auv_tpu.bayes.packing import (  # noqa: F401
    PackedPosterior,
    PackMeta,
    PackEntry,
    bayesianize,
    iter_variational_paths,
    kl_divergence,
    mean_params,
    sample_weights,
    sigma_of,
    softplus_inv,
)
