from must3r_tpu.models.encoder import encoder_forward, init_encoder  # noqa: F401
from must3r_tpu.models.decoder import (  # noqa: F401
    decoder_head,
    decoder_render,
    decoder_update,
    init_decoder,
)
