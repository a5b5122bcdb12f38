from must3r_tpu.ops.rope import make_rope_tables, apply_rope2d  # noqa: F401
from must3r_tpu.ops.geometry import (  # noqa: F401
    apply_exp_to_norm,
    apply_log_to_norm,
    normalize_pointcloud,
)
from must3r_tpu.ops.patch import patchify_positions, unpatchify  # noqa: F401
from must3r_tpu.ops.attention import (  # noqa: F401
    memory_cross_attention,
    pack_kv,
    self_attention,
)
