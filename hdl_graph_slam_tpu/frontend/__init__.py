from . import prefilter, odometry, floor
from .prefilter import Prefilter
from .odometry import ScanMatchingOdometry
from .odometry_device import DeviceOdometry
from .window import OdometryWindow, stack_scans
from .floor import FloorDetector
