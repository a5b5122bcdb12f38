from must3r_tpu.engine.inference import (  # noqa: F401
    InferenceCore,
    make_fused_offline,
    offline_reconstruction,
    offline_reconstruction_multi_ar,
    postprocess,
)
from must3r_tpu.engine.video import video_reconstruction  # noqa: F401
