from . import se3, plane, cloud, config
from .cloud import PointCloud, from_numpy
from .config import SlamConfig, PRESETS
