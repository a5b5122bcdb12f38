from must3r_tpu.retrieval.graph import farthest_point_sampling, make_pairs_fps  # noqa: F401
from must3r_tpu.retrieval.model import (  # noqa: F401
    RetrievalHead,
    how_select_local,
    pcawhiten_learn,
    weighted_spoc,
)
from must3r_tpu.retrieval.asmk import ASMK, train_codebook  # noqa: F401
