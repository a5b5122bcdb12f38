from must3r_tpu.datasets.base import (  # noqa: F401
    BatchedRandomSampler,
    CatDataset,
    MulDataset,
    MultiViewDataset,
    ResizedDataset,
    depthmap_to_world_points,
    make_view,
)
from must3r_tpu.datasets.dust3r_layout import (  # noqa: F401
    Co3dPreprocessed,
    ScanNetppPreprocessed,
)
from must3r_tpu.datasets.loader import collate_views, get_data_loader  # noqa: F401
from must3r_tpu.datasets.scenedir import Co3d, ScanNetpp, SceneDirDataset  # noqa: F401
from must3r_tpu.datasets.synthetic import SyntheticScenes  # noqa: F401
from must3r_tpu.datasets.tuple_maker import (  # noqa: F401
    fill_views,
    select_tuple_from_360_scene,
    select_tuple_from_pairs,
)
