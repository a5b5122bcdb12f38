from must3r_tpu.engine.inference import (  # noqa: F401
    InferenceCore,
    offline_reconstruction,
    postprocess,
)
