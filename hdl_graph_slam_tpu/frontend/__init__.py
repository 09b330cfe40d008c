from . import prefilter, odometry, floor
from .prefilter import Prefilter
from .odometry import ScanMatchingOdometry
from .floor import FloorDetector
