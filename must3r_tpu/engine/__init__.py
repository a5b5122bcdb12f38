from must3r_tpu.engine.inference import (  # noqa: F401
    InferenceCore,
    make_fused_offline,
    offline_reconstruction,
    postprocess,
)
