from . import base, gicp, vgicp, ndt, icp, factory
from .base import AlignResult
from .factory import Registration, select_registration_method
