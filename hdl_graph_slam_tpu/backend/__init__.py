from . import keyframe, information_matrix, loop_detector, map_cloud, slam
from .keyframe import KeyFrame, KeyFrameSnapshot, KeyframeUpdater
from .information_matrix import InformationMatrixCalculator
from .loop_detector import LoopDetector, Loop
from .map_cloud import MapCloudGenerator
from .slam import HdlGraphSlam, GpsMeasurement, ImuMeasurement, FloorMeasurement
