from . import geodesy
