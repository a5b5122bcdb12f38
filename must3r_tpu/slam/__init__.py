from must3r_tpu.slam.nns import KDTree3, QuadrantSearcher, get_searcher  # noqa: F401
from must3r_tpu.slam.model import SlamConfig, Must3rSLAM  # noqa: F401
