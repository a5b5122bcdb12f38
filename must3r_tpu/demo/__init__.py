from must3r_tpu.demo.inference import (  # noqa: F401
    SceneState,
    must3r_inference,
    must3r_inference_video,
    select_keyframes,
)
from must3r_tpu.demo.export import scene_to_glb, scene_to_ply  # noqa: F401
