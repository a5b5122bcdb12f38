from must3r_tpu.demo.inference import (  # noqa: F401
    SceneState,
    must3r_inference,
    must3r_inference_video,
    select_keyframes,
)
from must3r_tpu.demo.export import scene_to_glb, scene_to_ply  # noqa: F401


def __getattr__(name):  # lazy: webapp pulls in http plumbing
    if name == "WebDemo":
        from must3r_tpu.demo.webapp import WebDemo
        return WebDemo
    raise AttributeError(name)
